"""Fuzzy-join blocking selectivity: candidate count vs true pair count vs
the quadratic cross size, per fixture, at the given sf dir.

The round-3 verdict's watch item: on the 375-gram synthetic corpus even
rarest-prefix postings are hundreds long and candidate generation
approaches quadratic — masked by the cheap banded verify. This records
the number that decides the 100 TB story: candidates / |L|·|R| (the scan
fraction) and candidate growth across scale factors. Run at sf0.01 and
sf0.1 (a 10x) and compare: sub-quadratic blocking grows candidates ~10x,
quadratic grows them ~100x.

Usage: python tools/fuzzy_selectivity.py [sf_dir ...]
Prints one JSON line per (sf_dir, fixture).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.operators.fuzzy import fuzzy_candidates, fuzzy_join
from simtradedata_spark.session import get_spark


def _registries(spark, sf_dir: str, fixture: str):
    """Delegates to queries.py::fuzzy_fixture_registries — the single
    source of truth for both certified fixtures, so the recorded
    selectivity always describes the oracled corpora."""
    from simtradedata_spark.queries import fuzzy_fixture_registries

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_fixture_registries(docs, fixture)


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("fuzzy-selectivity")
    for sf_dir in sf_dirs:
        for fixture in ("tiny_vocab", "realistic_vocab"):
            clean, dirty = _registries(spark, sf_dir, fixture)
            nl, nr = clean.count(), dirty.count()
            holder = []
            t0 = time.time()
            n_cand = fuzzy_candidates(
                clean, dirty, "clean_id", "name", "dirty_id", "name",
                max_dist=2, q=3, _freq_out=holder,
            ).count()
            cand_s = round(time.time() - t0, 2)
            holder[0].unpersist()
            t0 = time.time()
            n_pairs = fuzzy_join(
                clean, dirty, "clean_id", "name", "dirty_id", "name",
                max_dist=2, q=3,
            ).count()
            join_s = round(time.time() - t0, 2)
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "fixture": fixture,
                        "left": nl,
                        "right": nr,
                        "cross_size": nl * nr,
                        "candidates": n_cand,
                        "scan_frac": round(n_cand / (nl * nr), 6),
                        "true_pairs": n_pairs,
                        "cand_per_pair": round(n_cand / max(n_pairs, 1), 1),
                        "candidates_sec": cand_s,
                        "join_sec": join_s,
                    }
                )
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
