"""JSONL source/sink round-trip + malformed-line contract."""

import gzip
import os


def test_jsonl_roundtrip_gz(spark, tmp_path):
    from walker_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, num_shards=4)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 4 and all(f.endswith(".json.gz") for f in files)
    back = read_jsonl(spark, out)
    assert back.count() == docs.count()
    a = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
         for r in back.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
         for r in docs.collect()}
    assert a == b


def test_jsonl_failfast_and_audit(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    from walker_spark.sources.jsonl import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    with pytest.raises(Py4JJavaError):
        read_jsonl(spark, str(p)).collect()
    rows = read_jsonl(spark, str(p), audit=True).collect()
    good = {r["doc_id"] for r in rows if r["_corrupt"] is None}
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert good == {1, 2} and len(bad) == 1
    assert "not json" in bad[0]["_corrupt"]


def test_jsonl_to_parquet_ingest(spark, tmp_path):
    from walker_spark.sources.jsonl import jsonl_to_parquet, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "src_jsonl")
    dst = str(tmp_path / "dst_parquet")
    write_jsonl(docs, src, num_shards=2, compress=False)
    n = jsonl_to_parquet(spark, src, dst, num_shards=3)
    assert n == docs.count()
    assert spark.read.parquet(dst).count() == n
