"""Compare two bench JSON outputs (small vs scaled sf) and report per-query
time ratios vs the data-scale factor.

Usage: python tools/scale_report.py SMALL.json BIG.json SCALE_FACTOR

A ratio well below the scale factor means the query is overhead-dominated at
the small sf (fixed Spark scheduling floor); a ratio well above it means
superlinear work — the thing to investigate. Queries on the generated
market (synthetic_* / indicator / PTrade families) don't read the sf dir at
all and should sit near ratio 1.0.

When BOTH artifacts carry a ``calibration`` block (bench.py records one
per run: fixed-work python + Spark probes), the summary additionally
reports the host-speed ratio and the calibration-NORMALIZED median — use
the normalized number for round-over-round comparisons (pass the older
round's artifact as SMALL, factor 1): r7/r8 were both recorded on
1.4-2x-degraded hosts, and raw ratios cannot distinguish that from a code
regression.
"""

from __future__ import annotations

import json
import sys


def main(small_path: str, big_path: str, factor: float) -> None:
    small_doc = json.load(open(small_path))
    big_doc = json.load(open(big_path))
    small = small_doc["queries"]
    big = big_doc["queries"]
    rows = []
    for name, t_small in small.items():
        t_big = big.get(name)
        if t_big is None or t_small <= 0 or t_big <= 0:
            continue
        rows.append((t_big / t_small, t_small, t_big, name))
    rows.sort(reverse=True)
    print(f"| query | t@small (s) | t@{factor}x (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, t_small, t_big, name in rows:
        flag = " ⚠" if ratio > factor * 1.2 else ""
        print(f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.1f}×{flag} |")
    ratios = [r[0] for r in rows]
    mid = sorted(ratios)[len(ratios) // 2]
    print(
        f"\nqueries={len(rows)} median_ratio={mid:.2f} "
        f"over_linear={sum(1 for r in ratios if r > factor * 1.2)} "
        f"(scale factor {factor}×)"
    )
    cal_s, cal_b = small_doc.get("calibration"), big_doc.get("calibration")
    if cal_s and cal_b:
        # Geometric mean of the python + spark probe ratios: one number for
        # "how much slower was the BIG artifact's host per unit of work".
        host = (
            (cal_b["python_sec"] / cal_s["python_sec"])
            * (cal_b["spark_sec"] / cal_s["spark_sec"])
        ) ** 0.5
        print(
            f"calibration: host_ratio={host:.3f} "
            f"(python {cal_b['python_sec']:.3f}/{cal_s['python_sec']:.3f}, "
            f"spark {cal_b['spark_sec']:.3f}/{cal_s['spark_sec']:.3f}) "
            f"normalized_median_ratio={mid / host:.2f}"
        )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
