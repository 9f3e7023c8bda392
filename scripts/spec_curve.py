"""Acceptance-parametric speculative-decode p50 curve (VERDICT r4 #3a).

The round-4 "0.78 s" spec-decode answer p50 rode a trajectory-degenerate
random-weight acceptance (~7.8 committed/step). The implementation-
independent measured facts are:

  single_step_ms  10.45   int8 paged decode, 4k ctx (BENCH_r04 / PARITY)
  verify8_ms       8.7    T=8 multi-query verify block, same geometry
                          (scripts/probe_spec.py: one attention sweep +
                          one commit replaces 8 sweeps + 8 appends)
  p50_plain_s      3.073  4k-prefill + 256-token answer (BENCH_r04)
  p50_spec78_s     0.78   same with --spec_tokens 7 at measured
                          acceptance 7.76 committed/step (probe_spec)

From these: prefill+fixed overhead = p50 - 256*single_step = 0.398 s, and
the measured spec run implies a per-step cost of
(0.78 - 0.398) / (256/7.76) = 11.6 ms = verify8 + ~2.9 ms host drafting
(ngram_propose + loop bookkeeping on the relay host). The curve is then

  p50(a) = 0.398 + (256 / a) * 0.0116        a = committed tokens/step

calibrated by measured text acceptance (SPEC_TEXT_ACCEPT.json — the
production drafter over real English answer corpora; prompt-lookup
acceptance is a property of text repetition, not weights):

  bpe16k median 1.159  (realistic subword vocab)   -> ~3% faster than plain
  byte   median 1.92   (finest granularity)        -> ~36% faster
  degenerate random-weight 7.76                    -> the old 0.78 s

Break-even vs plain decode sits at a = 256*0.0116 / (3.073 - 0.398)
= 1.11 committed/step: the T=8 verify block being CHEAPER than one decode
step means spec decode never loses much (worst case a=1: 3.38 s, +10%),
but on low-repetition free-form text it is near-neutral, and the honest
headline for answer generation is the curve, not a point.

Writes SPEC_CURVE.json. Pure arithmetic — no TPU.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEASURED = {
    "single_step_ms": 10.45,     # BENCH_r04 int8 4k decode
    "verify8_ms": 8.7,           # probe_spec T=8 verify block, 4k int8
    "p50_plain_s": 3.073,        # BENCH_r04 answer p50
    "p50_spec_meas_s": 0.78,     # probe_spec e2e at degenerate acceptance
    "accept_meas": 7.76,         # probe_spec measured committed/step
    "new_tokens": 256,
    "verify23k_ratio": 1.24,     # probe_spec at 23k ctx + int8 KV pages
}


def main():
    m = MEASURED
    base_s = m["p50_plain_s"] - m["new_tokens"] * m["single_step_ms"] / 1e3
    steps_meas = m["new_tokens"] / m["accept_meas"]
    per_step_s = (m["p50_spec_meas_s"] - base_s) / steps_meas
    host_ms = per_step_s * 1e3 - m["verify8_ms"]
    break_even = (m["new_tokens"] * per_step_s) / (m["p50_plain_s"] - base_s)

    def p50(a):
        return base_s + (m["new_tokens"] / a) * per_step_s

    curve = {f"{a}": round(p50(a), 3) for a in (1, 1.5, 2, 3, 4, 5, 6, 7, 8)}

    calib = {}
    spec_text_path = os.path.join(REPO, "SPEC_TEXT_ACCEPT.json")
    if os.path.exists(spec_text_path):
        with open(spec_text_path, encoding="utf-8") as f:
            st = json.load(f)
        for name, row in st.get("by_tokenizer", {}).items():
            med = row.get("median")
            if med:
                calib[name] = {
                    "committed_per_step_median": med,
                    "p50_s": round(p50(med), 3),
                    "vs_plain": round(m["p50_plain_s"] / p50(med), 3),
                }
    calib["degenerate_random_weights"] = {
        "committed_per_step_median": m["accept_meas"],
        "p50_s": round(p50(m["accept_meas"]), 3),
        "vs_plain": round(m["p50_plain_s"] / p50(m["accept_meas"]), 3),
    }

    out = {
        "description": "p50(acceptance) for the 4k+256 int8 answer with "
                       "--spec_tokens 7, from measured step costs; see "
                       "scripts/spec_curve.py for derivation/provenance",
        "measured_inputs": m,
        "derived": {
            "prefill_plus_fixed_s": round(base_s, 3),
            "per_spec_step_ms": round(per_step_s * 1e3, 2),
            "host_drafting_ms_per_step": round(host_ms, 2),
            "break_even_committed_per_step": round(break_even, 3),
        },
        "p50_s_by_committed_per_step": curve,
        "calibration": calib,
        "note": "prompt-lookup acceptance is text-repetition-dependent: "
                "low-repetition free-form answers sit near break-even; "
                "grounded/repetitive generation (literature 2-4/step) gains "
                "1.6-2.7x; the verify block costing less than one decode "
                "step bounds the worst case at +10%.",
    }
    path = os.path.join(REPO, "SPEC_CURVE.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out["derived"]))
    print(json.dumps(out["calibration"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
