"""Prompt-lookup acceptance on REAL text (VERDICT r4 #3b).

Prompt-lookup drafting acceptance is a property of TEXT repetition, not of
model weights: the drafter copies the continuation of the most recent
n-gram match from the prompt + generated-so-far history, and a token is
accepted iff the (real) continuation actually repeats it. This probe runs
the production drafter (`models.spec_decode.ngram_propose` — the same
function the on-chip verify loop calls) over real English documents and
measures the committed-tokens-per-step distribution directly:

  per document: prompt = the first `--prompt_frac` of its tokens, the
  "generation" = the next `--cont_tokens` tokens (the document's own true
  continuation). Each step proposes `--spec` drafts from the history; the
  accepted count is the longest prefix matching the true continuation;
  committed = accepted + 1 (the verify step's bonus token).

Corpus: real model-generated English answer texts shipped inside the
reference snapshot (`llamavid/eval/table/results/...13b.json` `outputs`:
4241 ScienceQA explanation answers — PUBLIC data used as text, not code).
Any JSON with a list/dict of strings, or a plain .txt (one doc per blank
line), works via --corpus.

Tokenizers (no pretrained vocab is fetchable here, so three brackets):
  bpe16k : byte-level BPE trained on a HELD-OUT half of the corpus
           (tokenizers lib) — realistic subword statistics, the headline
  word   : whitespace tokens — coarser than any production vocab
  byte   : raw bytes — finer than any production vocab

Runs on CPU (forced below): ngram_propose per step through the tunneled
chip would cost 50-90 ms/step of pure dispatch.

Run: python scripts/probe_spec_text.py [--docs 120] [--out SPEC_TEXT_ACCEPT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Force the CPU backend. Setting env here is TOO LATE for the axon
# sitecustomize (it captures PALLAS_AXON_POOL_IPS at interpreter start and
# force-registers the TPU backend — verified: the in-script pop still lands
# on `tpu`), so re-exec once with a scrubbed environment.
if os.environ.get("_SPEC_TEXT_CPU") != "1":
    env = dict(os.environ, JAX_PLATFORMS="cpu", _SPEC_TEXT_CPU="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CORPUS = ("/root/reference/llamavid/eval/table/results/"
                  "test_sqa_llava_lcs_558k_sqa_12e_vicuna_v1_3_13b.json")


def load_docs(path):
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        if isinstance(data, dict) and "outputs" in data:
            data = data["outputs"]
        if isinstance(data, dict):
            data = list(data.values())
        docs = [d if isinstance(d, str) else json.dumps(d) for d in data]
    else:
        with open(path, encoding="utf-8") as f:
            docs = [d.strip() for d in f.read().split("\n\n")]
    return [d for d in docs if len(d) > 200]


def make_tokenizers(train_docs):
    toks = {}

    def word_enc(text):
        return text.split()

    toks["word"] = word_enc
    toks["byte"] = lambda text: list(text.encode("utf-8"))

    try:
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token=None))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
        trainer = trainers.BpeTrainer(
            vocab_size=16000, special_tokens=[], show_progress=False,
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        )
        tok.train_from_iterator(train_docs, trainer)
        toks["bpe16k"] = lambda text: tok.encode(text).ids
    except Exception as e:  # noqa: BLE001 - bracket tokenizers still run
        print(f"bpe16k unavailable: {type(e).__name__}: {e}", file=sys.stderr)
    return toks


def doc_tokens_per_step(ids, prompt_frac, cont_tokens, spec, ngram):
    """Committed tokens/step for one document via the production drafter."""
    import jax.numpy as jnp

    from streamchat_tpu.models.spec_decode import ngram_propose

    n = len(ids)
    p = max(int(n * prompt_frac), ngram + 1)
    cont = ids[p:p + cont_tokens]
    if len(cont) < 16:
        return None
    hbuf = 1 << (p + len(cont)).bit_length()          # one padded bucket
    hist = np.zeros((1, hbuf), np.int32)
    hist[0, :p] = ids[:p]
    hist_len = p
    steps = 0
    committed = 0
    while committed < len(cont):
        draft = np.asarray(ngram_propose(
            jnp.asarray(hist), jnp.asarray([hist_len], jnp.int32),
            ngram=ngram, num_draft=spec,
        ))[0]
        accept = 0
        for t in range(min(spec, len(cont) - committed - 1)):
            if draft[t] != cont[committed + t]:
                break
            accept += 1
        commit_now = accept + 1                        # +1 verify bonus token
        new = cont[committed:committed + commit_now]
        hist[0, hist_len:hist_len + len(new)] = new
        hist_len += len(new)
        committed += commit_now
        steps += 1
    return committed / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=DEFAULT_CORPUS)
    ap.add_argument("--docs", type=int, default=120)
    ap.add_argument("--prompt_frac", type=float, default=0.6)
    ap.add_argument("--cont_tokens", type=int, default=192)
    ap.add_argument("--spec", type=int, default=7)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "SPEC_TEXT_ACCEPT.json"))
    args = ap.parse_args()

    docs = load_docs(args.corpus)
    rng = np.random.default_rng(0)
    rng.shuffle(docs)
    half = len(docs) // 2
    train, evald = docs[:half], docs[half:half + args.docs]
    print(f"{len(docs)} docs; BPE train {len(train)}, eval {len(evald)}",
          flush=True)

    report = {
        "description": "prompt-lookup committed-tokens/step on real English "
                       "text via the production drafter (ngram_propose); "
                       "acceptance is a text property, measured weight-free",
        "corpus": args.corpus,
        "docs_evaluated": len(evald),
        "prompt_frac": args.prompt_frac,
        "cont_tokens": args.cont_tokens,
        "spec_tokens": args.spec,
        "ngram": args.ngram,
        "by_tokenizer": {},
    }
    for name, enc in make_tokenizers(train).items():
        vals = []
        for d in evald:
            ids = enc(d)
            # word/bpe ids may be strings (word) — map to stable ints
            if ids and isinstance(ids[0], str):
                vocab = {}
                ids = [vocab.setdefault(w, len(vocab)) for w in ids]
            r = doc_tokens_per_step(
                list(ids), args.prompt_frac, args.cont_tokens,
                args.spec, args.ngram)
            if r is not None:
                vals.append(r)
        if not vals:
            continue
        v = np.asarray(vals)
        stats = {
            "docs": len(vals),
            "mean": round(float(v.mean()), 3),
            "median": round(float(np.median(v)), 3),
            "p10": round(float(np.percentile(v, 10)), 3),
            "p90": round(float(np.percentile(v, 90)), 3),
        }
        report["by_tokenizer"][name] = stats
        print(json.dumps({"tokenizer": name, **stats}), flush=True)

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
