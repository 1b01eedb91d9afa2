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
    docs = load_table(spark, sf_dir, "documents")
    if fixture == "tiny_vocab":
        # the certified fuzzy_doc_match shape: 60-word corpus prefixes
        clean = docs.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("clean_id"),
            F.substring("text", 1, 24).alias("name"),
        )
        base = F.substring("text", 1, 24)
        dirty_name = (
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.substring("text", 1, 7), F.substring(base, 9, 16)),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.substring("text", 1, 3), F.lit("x"), F.substring(base, 4, 21)
                ),
            )
            .otherwise(base)
        )
        dirty = docs.select(F.col("doc_id").alias("dirty_id"), dirty_name.alias("name"))
    else:
        # the certified fuzzy_match_realistic shape: 22-char base64 names,
        # 64^3 = 262k-gram space
        ids = docs.select("doc_id")
        name = F.substring(
            F.base64(
                F.unhex(F.md5(F.concat_ws("|", F.lit("nm"), F.col("doc_id"))))
            ),
            1, 22,
        )
        clean = ids.select(F.col("doc_id").alias("clean_id"), name.alias("name"))
        corrupted = (
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.substring(name, 1, 7), F.substring(name, 9, 14)),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.substring(name, 1, 3), F.lit("~"), F.substring(name, 5, 18)),
            )
            .otherwise(name)
        )
        other = F.substring(
            F.base64(
                F.unhex(F.md5(F.concat_ws("|", F.lit("oth"), F.col("doc_id"))))
            ),
            1, 22,
        )
        dirty = ids.select(
            F.col("doc_id"),
            F.explode(
                F.array(
                    F.struct(
                        (F.col("doc_id") * 2).alias("dirty_id"), corrupted.alias("name")
                    ),
                    F.struct(
                        (F.col("doc_id") * 2 + 1).alias("dirty_id"), other.alias("name")
                    ),
                )
            ).alias("r"),
        ).select("r.dirty_id", "r.name")
    return clean, dirty


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
