"""Memory subsystems: hierarchical visual memory tree, short-term frame FIFO,
and the textual dialogue MemoryBank.

Reference layers L3 (`utiles.py` tree builders/searchers) and L4
(`memory_bank/`), rebuilt TPU-first: features stay on device, captions/
metadata on host, all similarity scoring is batched matmuls against cached
embedding matrices instead of the reference's per-node model forwards.
"""

from streamchat_tpu.memory.bank import ForgetfulMemoryBank, MemoryBank, MemoryIndex
from streamchat_tpu.memory.short_term import ShortTermMemory
from streamchat_tpu.memory.tree import MemoryTreeNode, VisualMemoryTree

__all__ = [
    "ForgetfulMemoryBank",
    "MemoryBank",
    "MemoryIndex",
    "MemoryTreeNode",
    "ShortTermMemory",
    "VisualMemoryTree",
]
