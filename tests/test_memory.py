"""Memory subsystem tests.

Ports of the reference's inline harnesses (SURVEY.md §4): synthetic-bank tree
build/splice (utiles.py test_2/test_3), the canned-conversation MemoryBank
round-trip (utiles.py test_memory:1254-1370), and the mocked-summarizer
incremental simulation (utiles.py simulate_memory_construct:1656-2230).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamchat_tpu.memory.bank import MemoryBank, MemoryIndex, build_documents
from streamchat_tpu.memory.short_term import ShortTermMemory
from streamchat_tpu.memory.summarize import summarize_memory
from streamchat_tpu.memory.tree import VisualMemoryTree, _summarize_depth
from streamchat_tpu.ops.kmeans import weighted_kmeans_feature


def hash_embed(texts):
    """Deterministic fake text embedder: bag-of-character-bigram hashes."""
    out = np.zeros((len(texts), 32), np.float32)
    for i, t in enumerate(texts):
        for a, b in zip(t, t[1:]):
            out[i, (ord(a) * 31 + ord(b)) % 32] += 1.0
        if not t:
            out[i, 0] = 1.0
    return out


def make_tree(num_clusters=2, interval=3):
    key = jax.random.key(0)

    def merge(combined, k):
        c, _ = weighted_kmeans_feature(combined, k, key)
        return c

    return VisualMemoryTree(
        num_clusters=num_clusters,
        interval=interval,
        embed_fn=hash_embed,
        summarize_fn=lambda caps: "summary of: " + " | ".join(caps),
        merge_fn=merge,
    )


def chunk_features(key, n=4, p=8, d=16):
    return jax.random.normal(key, (n, p, d))


class TestVisualMemoryTree:
    def test_depth0_accumulation(self, key):
        tree = make_tree(interval=3)
        tree.add_chunks([chunk_features(key)], ["cap one"])
        tree.add_chunks([chunk_features(key)], ["cap two"])
        assert tree.counts_by_depth() == {0: 2}

    def test_summarize_splice_at_interval(self, key):
        tree = make_tree(num_clusters=2, interval=3)
        for i in range(3):
            tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [f"cap {i}"])
        # Third depth-0 node triggers a merge: one depth-1 root remains.
        assert tree.counts_by_depth() == {1: 1}
        root = tree.roots[0]
        assert root.depth == 1
        assert len(root.children) == 3
        assert root.text.startswith("summary of:")
        # Merged centroids are re-clustered to num_clusters.
        assert root.centroids.shape[0] == 2

    def test_second_level_merge(self, key):
        """Depth-2 root appears one chunk after interval^2 chunks: the
        reference merges at most once per update call, so the 9th chunk
        consumes its own depth-0 merge and the three depth-1 roots merge on
        the NEXT update (utiles.py:574-616 single-splice semantics)."""
        tree = make_tree(num_clusters=2, interval=3)
        for i in range(9):
            tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [f"cap {i}"])
        assert tree.counts_by_depth() == {1: 3}
        tree.add_chunks([chunk_features(jax.random.key(9), n=2)], ["cap 9"])
        assert tree.counts_by_depth() == {2: 1, 0: 1}
        assert len(tree.roots[0].children) == 3

    def test_summarize_depth_priority(self):
        """Deepest qualifying depth wins (utiles.py:525-536)."""
        tree = make_tree(interval=2)
        # Construct roots by hand: two depth-1 nodes + one depth-0.
        from streamchat_tpu.memory.tree import MemoryTreeNode

        mk = lambda d: MemoryTreeNode(jnp.zeros((1, 2, 4)), "t", depth=d)
        assert _summarize_depth([mk(1), mk(1), mk(0)], 2) == 1

    def test_search_returns_path_and_finest_text(self, key):
        tree = make_tree(num_clusters=2, interval=3)
        caps = ["a red car driving", "a dog in the park", "people eating lunch"]
        for i, c in enumerate(caps):
            tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [c])
        # One depth-1 root now; add one depth-0 leftover.
        tree.add_chunks([chunk_features(jax.random.key(7), n=2)], ["a dog chasing a ball"])
        q = jnp.asarray(hash_embed(["where is the dog"])[0])
        feats, texts = tree.search(q)
        # Descent emits one (feature, text) for the depth-1 root's best child
        # plus the best redundant depth-0 node appended last.
        assert len(feats) == len(texts) == 2
        assert texts[-1] == "a dog chasing a ball"

    def test_search_empty_tree(self):
        tree = make_tree()
        feats, texts = tree.search(jnp.ones((32,)))
        assert feats == [] and texts == []

    def test_state_roundtrip(self, key):
        tree = make_tree(num_clusters=2, interval=3)
        for i in range(4):
            tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [f"cap {i}"])
        state = tree.to_state()
        tree2 = VisualMemoryTree.from_state(
            state, 2, 3, hash_embed, lambda c: "s", lambda x, k: x[:k]
        )
        assert tree2.counts_by_depth() == tree.counts_by_depth()
        q = jnp.asarray(hash_embed(["cap 3"])[0])
        _, t1 = tree.search(q)
        _, t2 = tree2.search(q)
        assert t1 == t2


class TestShortTermMemory:
    def test_fifo_capacity(self, key):
        stm = ShortTermMemory(short_window=4, remember_window=2, tau=5.0)
        stm.extend(jax.random.normal(key, (6, 3, 4)))
        assert len(stm) == 4

    def test_sample_shape_and_order(self, key):
        stm = ShortTermMemory(short_window=8, remember_window=3, tau=5.0)
        frames = jnp.arange(8, dtype=jnp.float32)[:, None, None] * jnp.ones((8, 2, 2))
        stm.extend(frames)
        out = stm.sample(key)
        assert out.shape == (3, 2, 2)
        vals = np.asarray(out)[:, 0, 0]
        assert list(vals) == sorted(vals)  # temporal order preserved

    def test_small_buffer_returns_all(self, key):
        stm = ShortTermMemory(short_window=8, remember_window=5, tau=5.0)
        stm.extend(jnp.ones((2, 2, 2)))
        assert stm.sample(key).shape == (2, 2, 2)

    def test_empty_raises(self, key):
        stm = ShortTermMemory(4, 2, 5.0)
        with pytest.raises(ValueError):
            stm.sample(key)


CANNED_CONVERSATION = [
    ("What is the video doing now?", "A man is cooking in the kitchen."),
    ("What did he just pick up?", "He picked up a knife to cut vegetables."),
    ("Where is the dog?", "The dog is sleeping near the door."),
    ("What color is his shirt?", "His shirt is blue."),
    ("What happened at the end?", "He served the dish on a white plate."),
]


class TestMemoryBank:
    def test_roundtrip_and_schema(self, tmp_path):
        """Canned-conversation save -> index -> retrieve loop
        (port of utiles.py test_memory)."""
        path = str(tmp_path / "memory.json")
        bank = MemoryBank(path, hash_embed, top_k=1)
        user = "vid_001"
        assert bank.enter_name(user) is None  # new user
        for q, r in CANNED_CONVERSATION:
            bank.save_local_memory(user, q, r, date="2026-08-16")
        idx = bank.enter_name(user)
        assert isinstance(idx, MemoryIndex)
        assert len(idx) == len(CANNED_CONVERSATION)

        # On-disk schema matches the reference byte-format.
        import json

        stored = json.load(open(path, encoding="utf-8"))
        assert stored[user]["name"] == user
        turns = stored[user]["history"]["2026-08-16"]
        assert turns[0] == {
            "query": CANNED_CONVERSATION[0][0],
            "response": CANNED_CONVERSATION[0][1],
        }

        # Reload from disk into a fresh bank.
        bank2 = MemoryBank(path, hash_embed, top_k=1)
        idx2 = bank2.enter_name(user)
        assert len(idx2) == len(CANNED_CONVERSATION)

    def test_document_rendering(self):
        memory = {
            "u": {
                "name": "u",
                "history": {"2026-01-01": [{"query": "hi", "response": "hello"}]},
                "summary": {"2026-01-01": "greeting"},
            }
        }
        docs = build_documents(memory, "u")
        assert docs[0].page_content == (
            "Conversation content on 2026-01-01:[|User|]: hi; [|AI|]: hello"
        )
        assert docs[1].page_content == (
            "The summary of the conversation on 2026-01-01 is: greeting"
        )

    def test_search_groups_by_date_and_strips_prefix(self, tmp_path):
        # top_k=1 (the v0.3 default): adjacent hits from different dates
        # would stitch across dates — a reference quirk we preserve
        # (seperate_list groups by index only, local_doc_qa.py:160-176).
        bank = MemoryBank(str(tmp_path / "m.json"), hash_embed, top_k=1)
        user = "u"
        bank.enter_name(user)
        bank.save_local_memory(user, "where is the dog", "near the door", date="2026-01-01")
        bank.save_local_memory(user, "what about the cat", "on the sofa", date="2026-01-02")
        idx = bank.enter_name(user)
        date_docs, dates = idx.search_memory("where is the dog")
        assert len(date_docs) == 1
        assert "Conversation content on 2026-01-01" not in date_docs[0]
        assert "2026-01-01" in dates

    def test_reindex_embeds_only_new_docs(self, tmp_path):
        """Round-5 dispatch diet: each per-round index rebuild embeds only
        the turn just written (reference re-embeds every doc per rebuild,
        memory_utils.py:76-83); query embeds ride the same cache; results
        match the uncached path."""
        calls = []

        def counting_embed(texts):
            calls.append(list(texts))
            return hash_embed(texts)

        bank = MemoryBank(str(tmp_path / "m.json"), counting_embed, top_k=1)
        user = "u"
        bank.enter_name(user)
        bank.save_local_memory(user, "where is the dog", "door", date="2026-01-01")
        idx = bank.enter_name(user)
        n_first = sum(len(c) for c in calls)
        assert n_first == len(idx)                      # first build: all docs
        bank.save_local_memory(user, "what about the cat", "sofa", date="2026-01-01")
        idx = bank.enter_name(user)
        new_texts = [t for c in calls[1:] for t in c]
        assert sum(len(c) for c in calls) == n_first + 1   # only the new turn
        assert any("cat" in t for t in new_texts)
        # pre-warmed query: search embeds nothing further
        bank.precompute_embeddings(["where is the dog"])
        n_before = sum(len(c) for c in calls)
        date_docs, dates = idx.search_memory("where is the dog")
        assert sum(len(c) for c in calls) == n_before
        # parity with a cache-free index
        idx_ref = MemoryIndex(idx.docs, hash_embed, idx.chunk_size, idx.top_k)
        assert (date_docs, dates) == idx_ref.search_memory("where is the dog")

    def test_neighbor_stitching_same_date(self, tmp_path):
        """Adjacent same-date turns within the 200-char budget merge into one
        stitched result (local_doc_qa.py:135-178)."""
        bank = MemoryBank(str(tmp_path / "m.json"), hash_embed, top_k=1)
        user = "u"
        bank.enter_name(user)
        for q, r in [("q1 aa", "r1 bb"), ("q2 cc", "r2 dd"), ("q3 ee", "r3 ff")]:
            bank.save_local_memory(user, q, r, date="2026-01-01")
        idx = bank.enter_name(user)
        date_docs, _ = idx.search_memory("q2 cc")
        # All three short docs share the date and fit in 200 chars -> one group.
        assert len(date_docs) == 1
        assert "q1 aa" in date_docs[0] and "q3 ee" in date_docs[0]


class TestSummarizeMemory:
    def test_fills_summaries_and_overall(self):
        memory = {
            "u": {
                "name": "u",
                "history": {"2026-01-01": [{"query": "hi", "response": "hello"}]},
            }
        }
        calls = []

        def fake_llm(prompt):
            calls.append(prompt)
            return f"SUM{len(calls)}"

        out = summarize_memory(memory, fake_llm, name="u")
        assert out["u"]["summary"]["2026-01-01"] == {"content": "SUM1"}
        assert out["u"]["personality"]["2026-01-01"] == "SUM2"
        assert out["u"]["overall_history"] == "SUM3"
        assert out["u"]["overall_personality"] == "SUM4"
        # Prompt text matches the reference builder (summarize_memory.py:135-144).
        assert calls[0].startswith("Please summarize the following dialogue")
        assert calls[0].endswith("Summarization：")

    def test_existing_summaries_skipped(self):
        memory = {
            "u": {
                "history": {"d": [{"query": "q", "response": "r"}]},
                "summary": {"d": {"content": "keep"}},
                "personality": {"d": "keep too"},
            }
        }
        out = summarize_memory(memory, lambda p: "NEW")
        assert out["u"]["summary"]["d"] == {"content": "keep"}
        assert out["u"]["personality"]["d"] == "keep too"


class TestMaxSimSearch:
    def test_maxsim_descent(self, key):
        from streamchat_tpu.memory.tree import VisualMemoryTree

        def embed_tokens(texts):
            # 2 "tokens" per text: bigram hash split in half.
            flat = hash_embed(texts)                    # [N, 32]
            hidden = np.stack([flat[:, :16], flat[:, 16:]], axis=1)  # [N,2,16]
            mask = np.ones((len(texts), 2), np.int32)
            return hidden, mask

        tree = VisualMemoryTree(
            2, 3, hash_embed, lambda c: "sum:" + "|".join(c),
            lambda x, k: x[:2], embed_tokens_fn=embed_tokens,
        )
        caps = ["a red car driving", "a dog in the park", "people eating lunch"]
        for i, c in enumerate(caps):
            tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [c])
        tree.add_chunks([chunk_features(jax.random.key(9), n=2)], ["a dog chasing a ball"])

        q_hidden, _ = embed_tokens(["where is the dog"])
        feats, texts = tree.search_maxsim(jnp.asarray(q_hidden[0]))
        assert len(feats) == len(texts) == 2
        assert texts[-1] == "a dog chasing a ball"

    def test_maxsim_without_token_fn_raises(self, key):
        tree = make_tree(interval=2)
        tree.add_chunks([chunk_features(key, n=2)], ["a"])
        tree.add_chunks([chunk_features(key, n=2)], ["b"])  # merged to depth-1
        with pytest.raises(ValueError, match="embed_tokens_fn"):
            tree.search_maxsim(jnp.ones((2, 16)))

    def test_state_roundtrip_with_tokens(self, key):
        from streamchat_tpu.memory.tree import VisualMemoryTree

        def embed_tokens(texts):
            flat = hash_embed(texts)
            return np.stack([flat[:, :16], flat[:, 16:]], 1), np.ones((len(texts), 2), np.int32)

        tree = VisualMemoryTree(2, 3, hash_embed, lambda c: "s",
                                lambda x, k: x[:2], embed_tokens_fn=embed_tokens)
        tree.add_chunks([chunk_features(key, n=2)], ["hello world"])
        state = tree.to_state()
        tree2 = VisualMemoryTree.from_state(state, 2, 3, hash_embed,
                                            lambda c: "s", lambda x, k: x[:2])
        assert tree2.roots[0].token_emb is not None


def test_long_stream_tree_stress(key):
    """Hours-scale stream: 200 chunks keep the root list bounded and search
    fast (the tree folds every `interval` roots into a parent)."""
    tree = make_tree(num_clusters=2, interval=5)
    for i in range(200):
        tree.add_chunks([chunk_features(jax.random.key(i), n=2)], [f"c{i}"])
    counts = tree.counts_by_depth()
    assert sum(len(n.children) == 0 for n in tree.all_nodes()) == 200  # leaves kept
    assert len(tree.roots) < 25                 # root list stays compact
    assert max(counts) >= 3                     # hierarchy deepened
    import time as _t

    t0 = _t.perf_counter()
    feats, texts = tree.search(jnp.asarray(hash_embed(["c150"])[0]))
    assert texts
    assert _t.perf_counter() - t0 < 5.0
