"""Sketch aggregations stay within their advertised error of exact answers."""

from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.operators.sketches import approx_quantiles_by, hll_distinct_by


def test_hll_within_rsd(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    approx = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_distinct_by(li, ["l_returnflag"], "l_orderkey").collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05 * 3  # 3 sigma of rsd=5%


def test_approx_quantiles_near_exact(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    got = approx_quantiles_by(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9]
    ).collect()
    for r in got:
        flag, (p50, p90) = r["l_returnflag"], r["quantiles"]
        exact = li.filter(F.col("l_returnflag") == flag).selectExpr(
            "percentile(l_extendedprice, array(0.5, 0.9)) AS q"
        ).first()["q"]
        assert abs(p50 - exact[0]) / exact[0] < 0.01
        assert abs(p90 - exact[1]) / exact[1] < 0.01


def test_exact_quantiles_sorted_equals_percentile(spark):
    """Sort-path exact quantiles == percentile() (same continuous def)."""
    from pyspark.sql import functions as F

    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.sketches import exact_quantiles_sorted

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r["l_returnflag"]: r
        for r in exact_quantiles_sorted(
            li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9]
        ).collect()
    }
    want = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k]["q_0_5"] - want[k]["p50"]) < 1e-9, k
        assert abs(got[k]["q_0_9"] - want[k]["p90"]) < 1e-9, k


def test_persisted_ivf_index_prunes_and_matches_brute_force(spark, tmp_path):
    """The persisted IVF index: exhaustive probes ≡ brute force, and a
    partial probe's scan carries a PartitionFilters predicate on cell —
    unprobed cells contribute zero input files."""
    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.similarity import (
        build_ivf_index,
        cosine_top_k,
        ivf_probe_persisted,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_lists=8)
    queries = emb.filter("vec_id < 5")

    exhaustive = ivf_probe_persisted(spark, idx, queries, k=3, n_probe=8)
    brute = cosine_top_k(emb, queries, k=3)
    assert {tuple(r) for r in exhaustive.collect()} == {
        tuple(r) for r in brute.collect()
    }

    import re

    one_query = emb.filter("vec_id = 0")
    partial = ivf_probe_persisted(spark, idx, one_query, k=3, n_probe=2)
    plan = partial._jdf.queryExecution().executedPlan().toString()
    # a NON-EMPTY PartitionFilters expression on cell — an unfiltered
    # partitioned scan prints "PartitionFilters: []", so a bare substring
    # match would be vacuous (and inputFiles() lists files pre-pruning)
    m = re.search(r"PartitionFilters: \[[^\]]*cell", plan)
    assert m, plan
    # and the probe genuinely restricted candidates to <= n_probe cells
    cells = {r["cell"] for r in
             spark.read.parquet(f"{idx}/vectors").select("cell").distinct().collect()}
    assert len(cells) == 8
    assert partial.count() > 0


def test_ivf_index_append_equals_rebuild_under_same_centroids(spark, tmp_path):
    """Incremental index maintenance: append a new batch into the
    persisted index, then compare against an index REBUILT from scratch
    over the union under the pinned sidecar centroids — probe results
    must be identical (the quantizer never drifts on append). The
    replayed append must be a no-op, and the original index files must
    be byte-untouched."""
    import json
    import os

    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_probe_persisted,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter("vec_id % 5 != 0")
    batch = emb.filter("vec_id % 5 = 0")

    idx = str(tmp_path / "ivf_incr")
    build_ivf_index(base, idx, n_lists=8)

    def _files(root):
        out = {}
        for dirpath, _dirs, files in os.walk(os.path.join(root, "vectors")):
            for f in files:
                if not f.startswith(("_", ".")):
                    p = os.path.join(dirpath, f)
                    out[os.path.relpath(p, root)] = os.path.getsize(p)
        return out

    before = _files(idx)
    n1 = ivf_index_append(spark, idx, batch)
    assert n1 == batch.count()
    after = _files(idx)
    # append-only: every original file still present with its exact size
    assert before.items() <= after.items()

    # replay (crash-retry) converges: nothing new to add
    assert ivf_index_append(spark, idx, batch) == 0
    assert _files(idx) == after

    # rebuild from scratch over the union, quantizer PINNED to the
    # incremental index's sidecar — probes must agree exactly
    with open(os.path.join(idx, "centroids.json")) as fh:
        cent = json.load(fh)
    idx2 = str(tmp_path / "ivf_rebuilt")
    build_ivf_index(emb, idx2, n_lists=8, centroids=cent)
    queries = emb.filter("vec_id < 5")
    a = ivf_probe_persisted(spark, idx, queries, k=3, n_probe=3)
    b = ivf_probe_persisted(spark, idx2, queries, k=3, n_probe=3)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_cms_overcounts_only_and_is_exact_when_wide(spark):
    """CMS point estimates dominate true counts; with width >> distinct
    values, collisions vanish and the estimate is exact. The sparse table
    never exceeds depth x width rows and merges counter-wise."""
    from simtradedata_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    rows = [(t,) for t, k in [("a", 50), ("b", 20), ("c", 5), ("d", 1)] for t in [t] * k]
    df = spark.createDataFrame(rows, ["tok"])
    items = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("never",)], ["tok"]
    )
    true = {"a": 50, "b": 20, "c": 5, "d": 1, "never": 0}

    # tiny width (2 buckets, 4 values) forces collisions -> strict overcount
    # somewhere, but never an undercount anywhere
    tiny = count_min_sketch(df, "tok", depth=3, width=2)
    assert tiny.count() <= 3 * 2
    est_tiny = {
        r["tok"]: r["cms_count"]
        for r in cms_estimate(tiny, items, "tok", depth=3, width=2).collect()
    }
    assert all(est_tiny[t] >= n for t, n in true.items())
    assert any(est_tiny[t] > n for t, n in true.items())

    # wide sketch: exact for every probed item, including a never-seen one
    wide = count_min_sketch(df, "tok", depth=4, width=4096)
    est_wide = {
        r["tok"]: r["cms_count"]
        for r in cms_estimate(wide, items, "tok", depth=4, width=4096).collect()
    }
    assert est_wide == true

    # mergeability: sketch(A) + sketch(B) counter-wise == sketch(A union B)
    half1 = spark.createDataFrame(rows[:38], ["tok"])
    half2 = spark.createDataFrame(rows[38:], ["tok"])
    merged = (
        count_min_sketch(half1, "tok", depth=3, width=2)
        .unionByName(count_min_sketch(half2, "tok", depth=3, width=2))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, tiny.collect())
    )


def test_cms_md5_backend_matches_duckdb_replay(spark):
    """The md5 hash backend's counter table is engine-reproducible: DuckDB
    rebuilds the byte-identical sketch from the same rows."""
    import duckdb

    from simtradedata_spark.operators.sketches import count_min_sketch

    rows = [("tok%d" % (i % 7),) for i in range(100)]
    df = spark.createDataFrame(rows, ["tok"])
    got = sorted(
        map(tuple, count_min_sketch(df, "tok", depth=3, width=64, hash_fn="md5").collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (tok VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                """
                SELECT d,
                       ('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || tok),
                        1, 15))::BIGINT % 64 AS bucket,
                       count(*) AS cnt
                FROM t, unnest([0, 1, 2]) AS u(d) GROUP BY 1, 2
                """
            ).fetchall(),
        )
    )
    assert got == want


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value tests positive; a tiny filter yields a
    deterministic false positive but never a false negative; two filters
    OR-merge into the union's filter."""
    from simtradedata_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    vals = [("v%d" % i,) for i in range(64)]
    df = spark.createDataFrame(vals, ["v"])
    m, k = 1 << 12, 4
    sk = bloom_build(df, "v", m_bits=m, k=k)
    assert sk.count() <= (m + 62) // 63

    probe_rows = vals + [("absent%d" % i,) for i in range(200)]
    items = spark.createDataFrame(probe_rows, ["v"])
    got = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(sk, items, "v", m_bits=m, k=k).collect()
    }
    assert all(got["v%d" % i] for i in range(64))  # no false negatives
    # at m=4096/k=4/n=64 the FP rate is ~1e-5: all 200 absents negative
    assert not any(got["absent%d" % i] for i in range(200))

    # a saturated filter (m=8: 128 draws over 8 bits) says yes to
    # everything — the degenerate all-false-positive end of the
    # trade-off, still no-FN
    tiny = bloom_build(df, "v", m_bits=8, k=2)
    got_tiny = bloom_might_contain(tiny, items, "v", m_bits=8, k=2)
    assert got_tiny.filter("NOT might_contain").count() == 0

    # OR-merge == filter of the union
    from pyspark.sql import functions as F2

    a = spark.createDataFrame(vals[:32], ["v"])
    b = spark.createDataFrame(vals[32:], ["v"])
    merged = (
        bloom_build(a, "v", m_bits=m, k=k)
        .unionByName(bloom_build(b, "v", m_bits=m, k=k))
        .groupBy("word_idx")
        .agg(F2.bit_or("word").alias("word"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )


def test_bloom_flag_col_matches_distinct_probe(spark):
    """bloom_flag_col (the zero-shuffle per-row probe the curation chain
    and the decontam twin use) returns bit-identical verdicts to
    bloom_might_contain's distinct-probe shape, preserves every input row
    and column, and probes NULL items false."""
    from simtradedata_spark.operators.sketches import (
        bloom_build,
        bloom_flag_col,
        bloom_might_contain,
    )

    vals = [("v%d" % i,) for i in range(64)]
    df = spark.createDataFrame(vals, ["v"])
    m, k = 1 << 12, 4
    sk = bloom_build(df, "v", m_bits=m, k=k)

    rows = [
        (i, "v%d" % (i % 80))  # mixes present (64) and absent values
        for i in range(300)
    ] + [(999, None)]
    items = spark.createDataFrame(rows, ["rid", "v"])

    flagged = bloom_flag_col(sk, items, "v", m_bits=m, k=k)
    assert flagged.columns == ["rid", "v", "might_contain"]
    assert flagged.count() == 301  # every row preserved, no dedup

    ref = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(
            sk, items, "v", m_bits=m, k=k
        ).collect()
    }
    for r in flagged.collect():
        if r["v"] is None:
            assert r["might_contain"] is False
        else:
            assert r["might_contain"] == ref[r["v"]], r["v"]


def test_bloom_flag_col_files_path_and_bitset_dedupe(spark, monkeypatch):
    """Above BLOOM_FILES_THRESHOLD the bitset ships via SparkFiles +
    read-only memmap (one page-cache copy per node) instead of
    sc.broadcast. Forcing the threshold to 0 must (a) keep verdicts
    bit-identical to the distinct-probe shape, and (b) ship the SAME
    filter once per session — a second call reuses the content-hashed
    file instead of accumulating another corpus-sized addFile."""
    from simtradedata_spark.operators import sketches as sk_mod
    from simtradedata_spark.operators.sketches import (
        bloom_build,
        bloom_flag_col,
        bloom_might_contain,
    )

    monkeypatch.setattr(sk_mod, "BLOOM_FILES_THRESHOLD", 0)

    vals = [("v%d" % i,) for i in range(64)]
    m, k = 1 << 12, 4
    sk = bloom_build(spark.createDataFrame(vals, ["v"]), "v", m_bits=m, k=k)
    items = spark.createDataFrame(
        [(i, "v%d" % (i % 80)) for i in range(300)] + [(999, None)],
        ["rid", "v"],
    )

    res: list = []
    flagged = bloom_flag_col(sk, items, "v", m_bits=m, k=k, resources=res)
    assert len(res) == 1 and isinstance(res[0], str)  # files mode: a name
    ref = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(sk, items, "v", m_bits=m, k=k).collect()
    }
    for r in flagged.collect():
        want = False if r["v"] is None else ref[r["v"]]
        assert r["might_contain"] == want, r["v"]

    # same sketch again -> same shipped file, no second addFile
    res2: list = []
    bloom_flag_col(sk, items, "v", m_bits=m, k=k, resources=res2).collect()
    assert res2 == res
