"""JSONL corpus interchange: enforced-schema round trip, malformed-line
quarantine, shard control."""

import glob
import os

from simtradedata_spark.catalog import load_table
from simtradedata_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


def test_jsonl_roundtrip_preserves_documents(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, n_shards=4)
    shards = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(shards) == 4
    back, bad = split_corrupt(read_jsonl(spark, out))
    assert bad.count() == 0
    a = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
         for r in docs.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
         for r in back.collect()}
    assert a == b


def test_jsonl_malformed_lines_quarantined_not_dropped(spark, tmp_path):
    out = str(tmp_path / "mixed")
    os.makedirs(out)
    with open(os.path.join(out, "shard0.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "good row", "lang": "en", '
                 '"source": "s", "n_chars": 8}\n')
        fh.write("\n")  # blank line: quarantined, never a phantom null doc
        fh.write("this is not json at all\n")
        fh.write('{"doc_id": 2, "text": "also good", "lang": "en", '
                 '"source": "s", "n_chars": 9}\n')
        # schema-violating type: doc_id is a string
        fh.write('{"doc_id": "xyz", "text": "bad id"}\n')
    clean, bad = split_corrupt(read_jsonl(spark, out))
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    raws = [r["_corrupt_record"] for r in bad.collect()]
    assert len(raws) == 3
    assert any("not json" in r for r in raws)
    assert "" in raws  # the blank line
    assert clean.filter("doc_id IS NULL").count() == 0
    # extra keys are ignored, missing keys arrive as nulls
    with open(os.path.join(out, "shard1.jsonl"), "w") as fh:
        fh.write('{"doc_id": 3, "text": "no lang", "extra_key": 42}\n')
    clean2, _ = split_corrupt(read_jsonl(spark, out))
    row3 = clean2.filter("doc_id = 3").first()
    assert row3["lang"] is None and "extra_key" not in clean2.columns
