"""CLI smoke tests — the operational surface the reference exposes via
scripts/download_efficient.py (its own __main__.py is broken, SURVEY §0.1)."""

from simtradedata_spark.__main__ import main


def test_cli_build_smoke(spark, tmp_path):
    root = str(tmp_path / "wh")
    rc = main(
        [
            "build",
            "--root",
            root,
            "--symbols",
            "4",
            "--start",
            "2022-01-03",
            "--end",
            "2022-03-31",
        ]
    )
    assert rc == 0
    from simtradedata_spark.sources.tables import Warehouse

    wh = Warehouse(spark, root)
    assert "bars" in wh.tables() and "ticks" in wh.tables()
    assert wh.read("bars").count() > 0


def test_cli_parser_shapes():
    import pytest

    with pytest.raises(SystemExit):
        main([])  # subcommand required
    with pytest.raises(SystemExit):
        main(["build"])  # --root required


def test_cli_maintain_smoke(spark, tmp_path):
    """maintain compacts every warehouse table and vacuums a snapshot
    store in one invocation — the nightly job as a command."""
    from simtradedata_spark.sources.tables import Warehouse
    from simtradedata_spark.streaming.incremental import (
        list_versions,
        upsert_batch,
    )

    root = str(tmp_path / "mwh")
    rc = main(
        ["build", "--root", root, "--symbols", "3",
         "--start", "2022-01-03", "--end", "2022-02-28"]
    )
    assert rc == 0
    store = str(tmp_path / "snap")
    for b in range(3):
        upsert_batch(
            spark.createDataFrame([(1, b)], "k long, v long"), b, store, ["k"]
        )
    rc = main(
        ["maintain", "--root", root, "--vacuum", store, "--keep", "1"]
    )
    assert rc == 0
    assert list_versions(store) == [2]
    wh = Warehouse(spark, root)
    assert wh.read("bars").count() > 0


def test_cli_export_corpus(spark, tmp_path):
    """The corpus-release command: shards + datacard land, the shard
    contents are exactly the funnel's n_sampled set, benchmark excluded."""
    import glob
    import json as _json

    from simtradedata_spark.sources.jsonl import read_jsonl, split_corrupt

    out = str(tmp_path / "release")
    rc = main(
        ["export-corpus", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out, "--shards", "2"]
    )
    assert rc == 0
    card = _json.load(open(f"{out}/_datacard.json"))
    assert card["totals"]["n_sampled"] > 0
    assert "src0" not in card["per_source"]  # benchmark never ships

    shards = glob.glob(f"{out}/shards/part-*.json.gz")
    assert len(shards) == 2
    back, bad = split_corrupt(read_jsonl(spark, f"{out}/shards"))
    assert bad.count() == 0
    assert back.count() == card["totals"]["n_sampled"]
    assert back.filter("source = 'src0'").count() == 0


def test_cli_ingest_ticks_incremental_fold(spark, tmp_path):
    """ingest-ticks folds a new day's tick batch into minute_bars via
    dynamic partition overwrite: the result equals the flat recompute
    over all ticks, and only the touched trade_year partition is
    rewritten."""
    import os

    from pyspark.sql import functions as F

    from simtradedata_spark.operators.resample import time_bars_from_ticks
    from simtradedata_spark.sources.synthetic import SyntheticMarket
    from simtradedata_spark.sources.tables import Warehouse

    root = str(tmp_path / "wh")
    # warehouse covering 2022 only; the new batch lands in 2023
    rc = main(["build", "--root", root, "--symbols", "3",
               "--start", "2022-11-01", "--end", "2022-12-30"])
    assert rc == 0
    wh = Warehouse(spark, root)
    files_2022 = sorted(
        os.listdir(os.path.join(root, "minute_bars", "trade_year=2022"))
    )

    m2 = SyntheticMarket(spark, n_symbols=3, start="2023-01-02", end="2023-01-13")
    batch_dir = str(tmp_path / "batch")
    m2.ticks(n_per_day=40).write.mode("overwrite").parquet(batch_dir)

    rc = main(["ingest-ticks", "--root", root, "--ticks", batch_dir])
    assert rc == 0
    # replay guard: re-running the same batch is a no-op (no double-fold)
    n_ticks_after = spark.read.parquet(os.path.join(root, "ticks")).count()
    rc = main(["ingest-ticks", "--root", root, "--ticks", batch_dir])
    assert rc == 0
    assert spark.read.parquet(os.path.join(root, "ticks")).count() == n_ticks_after
    # crash-heal: same data under a NEW batch id appends nothing (anti-join)
    # and the rebuild converges to the same bars
    rc = main(["ingest-ticks", "--root", root, "--ticks", batch_dir,
               "--batch-id", "retry-after-crash"])
    assert rc == 0
    assert spark.read.parquet(os.path.join(root, "ticks")).count() == n_ticks_after

    got = wh.read("minute_bars").drop(
        "open_ord", "close_ord", "money_e4", "trade_year"
    )
    all_ticks = spark.read.parquet(os.path.join(root, "ticks")).drop("trade_year")
    flat = time_bars_from_ticks(all_ticks, minutes=1)
    assert got.exceptAll(flat).count() == 0
    assert flat.exceptAll(got).count() == 0
    # the untouched 2022 partition kept its exact file set
    assert sorted(
        os.listdir(os.path.join(root, "minute_bars", "trade_year=2022"))
    ) == files_2022
    assert os.path.isdir(os.path.join(root, "minute_bars", "trade_year=2023"))
