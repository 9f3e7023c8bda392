from streamchat_tpu.utils.logging import get_logger, PhaseTimer
from streamchat_tpu.utils.prng import KeySeq

__all__ = ["get_logger", "PhaseTimer", "KeySeq"]
