#!/usr/bin/env python3
"""Report for tools/ab_bench.sh: per-query medians of the interleaved
control/current Bench runs, ratio-sorted, with the noise band marked.

A per-query ratio inside [0.8, 1.25] is NOT evidence of anything on this
machine (±20% run-to-run noise, SCALE.md round-9 note). With reps=1 even
out-of-band ratios are weak — rerun with reps=3 before acting."""
import json
import statistics
import sys
from pathlib import Path

NOISE_LO, NOISE_HI = 0.80, 1.25


def medians(out: Path, prefix: str, reps: int):
    per_q, totals = {}, []
    for i in range(1, reps + 1):
        data = json.loads((out / f"{prefix}_{i}.json").read_text())
        totals.append(data["value"])
        for q, s in data["queries"].items():
            per_q.setdefault(q, []).append(s)
    return ({q: statistics.median(v) for q, v in per_q.items()},
            statistics.median(totals))


def main():
    out, reps = Path(sys.argv[1]), int(sys.argv[2])
    ctrl, ctrl_total = medians(out, "ctrl", reps)
    cur, cur_total = medians(out, "cur", reps)
    rows = []
    for q in sorted(set(ctrl) | set(cur)):
        c, n = ctrl.get(q), cur.get(q)
        ratio = (n / c) if (c and n and c > 0) else float("nan")
        rows.append((ratio, q, c, n))
    rows.sort(key=lambda r: -r[0])
    print(f"{'query':<28} {'ctrl_s':>8} {'cur_s':>8} {'ratio':>6}  verdict")
    flagged = 0
    for ratio, q, c, n in rows:
        cs = f"{c:.3f}" if c is not None else "-"
        ns = f"{n:.3f}" if n is not None else "-"
        if c is None or n is None:
            verdict = "ONLY ON ONE SIDE"
        elif ratio > NOISE_HI:
            verdict, flagged = "SLOWER (out of noise band)", flagged + 1
        elif ratio < NOISE_LO:
            verdict = "faster (out of noise band)"
        else:
            verdict = ""
        if verdict or abs(ratio - 1) > 0.1:
            print(f"{q:<28} {cs:>8} {ns:>8} {ratio:>6.2f}  {verdict}")
    print(f"\ntotal: ctrl {ctrl_total:.1f}s -> cur {cur_total:.1f}s "
          f"(ratio {cur_total / ctrl_total:.2f}; reps={reps}; "
          f"noise band [{NOISE_LO}, {NOISE_HI}] per query, ±20% on totals)")
    if reps < 3 and flagged:
        print("NOTE: reps<3 — rerun `tools/ab_bench.sh 3` before treating "
              "any SLOWER row as a real regression.")


if __name__ == "__main__":
    main()
