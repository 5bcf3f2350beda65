"""Stream-stream interval join: stream output == batch twin ==
range_join, and a behind-the-watermark right event emits nothing on
resume (state-bounded drop semantics)."""

import datetime as dt
import os


def _ts(s):
    return dt.datetime(2024, 1, 1, 12, 0, s)


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        path
    )


L_SCHEMA = "k string, l_ts timestamp, fetch_id long"
R_SCHEMA = "k string, r_ts timestamp, click_id long"


def _run(spark, ldir, rdir, out, ck):
    from walker_spark.streaming.interval_join import stream_interval_join

    l = spark.readStream.schema(L_SCHEMA).parquet(ldir)
    r = spark.readStream.schema(R_SCHEMA).parquet(rdir)
    j = stream_interval_join(
        l, r, "k", "l_ts", "r_ts", max_delay_ms=5_000, watermark="10 seconds"
    )
    (
        j.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_stream_interval_join_matches_batch_twin_and_drops_late(spark, tmp_path):
    from walker_spark.operators.joins import range_join
    from walker_spark.streaming.interval_join import stream_interval_join

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    lrows = [("a", _ts(0), 1), ("a", _ts(20), 2), ("b", _ts(0), 3)]
    rrows = [
        ("a", _ts(2), 10),   # joins fetch 1 (within 5s)
        ("a", _ts(5), 11),   # 5s after fetch 1: half-open end, NO join
        ("a", _ts(22), 12),  # joins fetch 2
        ("b", _ts(3), 13),   # joins fetch 3
        ("c", _ts(2), 14),   # no left partner
    ]
    _write(spark, ldir, lrows, L_SCHEMA)
    _write(spark, rdir, rrows, R_SCHEMA)
    _run(spark, ldir, rdir, out, ck)

    got = {
        (r["k"], r["fetch_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("a", 1, 10), ("a", 2, 12), ("b", 3, 13)}

    # batch twin: the SAME function on batch frames
    twin = stream_interval_join(
        spark.createDataFrame(lrows, L_SCHEMA),
        spark.createDataFrame(rrows, R_SCHEMA),
        "k",
        "l_ts",
        "r_ts",
        max_delay_ms=5_000,
    )
    assert {
        (r["k"], r["fetch_id"], r["click_id"]) for r in twin.collect()
    } == got

    # ...and range_join with the left side as explicit intervals
    from pyspark.sql import functions as F

    ivs = spark.createDataFrame(lrows, L_SCHEMA).select(
        F.col("k"),
        F.col("l_ts").alias("s"),
        (F.col("l_ts") + F.expr("INTERVAL 5 SECONDS")).alias("e"),
        "fetch_id",
    )
    pts = spark.createDataFrame(rrows, R_SCHEMA)
    rj = range_join(pts, ivs, "r_ts", "s", "e", on=["k"], bucket_ms=5_000)
    assert {
        (r["k"], r["fetch_id"], r["click_id"]) for r in rj.collect()
    } == got

    # resume with a right event far behind the checkpointed watermark
    # (max event time seen was 12:00:22; watermark 10s => 12:00:12):
    # no state, no output
    n_before = spark.read.parquet(out).count()
    _write(spark, rdir, [("a", _ts(1), 99)], R_SCHEMA)
    _run(spark, ldir, rdir, out, ck)
    assert spark.read.parquet(out).count() == n_before


def test_stream_interval_join_rejects_collision_and_bad_delay(spark):
    import pytest

    from walker_spark.streaming.interval_join import stream_interval_join

    l = spark.createDataFrame([], "k string, t timestamp, x long")
    r = spark.createDataFrame([], "k string, u timestamp, x long")
    with pytest.raises(ValueError):
        stream_interval_join(l, r, "k", "t", "u", max_delay_ms=1000)
    r2 = spark.createDataFrame([], "k string, u timestamp, y long")
    with pytest.raises(ValueError):
        stream_interval_join(l, r2, "k", "t", "u", max_delay_ms=0)
