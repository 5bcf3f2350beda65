"""Streaming trending tokens over a persisted Count-Min sketch
(streaming/trending.py): per-batch sketch commits are idempotent
(batch-path overwrite), the merged sketch obeys the CMS sum law, and
a planted spike token tops the trending query."""

from __future__ import annotations

from walker_spark.operators.sketches import cms_counts
from walker_spark.streaming.trending import (
    DEPTH,
    WIDTH,
    commit_batch,
    merged_sketch,
    stream_trending_tokens,
    trending_tokens,
)

WIN_MS = 1000


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ts_ms long, text string")


def test_trending_pipeline_and_idempotent_redelivery(spark, tmp_path):
    sketch = str(tmp_path / "sketch")
    cand = str(tmp_path / "cand")
    # window 0: background chatter; window 1: same chatter + a spike
    b0 = _docs(
        spark,
        [(1, 100, "alpha beta gamma " * 5), (2, 900, "alpha beta delta")],
    )
    b1 = _docs(
        spark,
        [
            (3, 1100, "alpha beta gamma"),
            (4, 1500, "surge surge surge surge surge surge beta"),
        ],
    )
    commit_batch(b0, 0, sketch, cand, WIN_MS)
    commit_batch(b1, 1, sketch, cand, WIN_MS)

    merged_before = sorted(map(tuple, merged_sketch(spark, sketch).collect()))

    # merge law: the persisted per-batch cells summed == the sketch
    # built from the union corpus in one shot
    from walker_spark.streaming.trending import _batch_tokens

    union_toks = _batch_tokens(b0.unionByName(b1), WIN_MS)
    whole = sorted(
        map(
            tuple,
            cms_counts(union_toks, ["win"], "item", depth=DEPTH, width=WIDTH)
            .collect(),
        )
    )
    assert merged_before == whole

    top = trending_tokens(spark, sketch, cand, win=1, top_k=3).collect()
    assert top[0]["item"] == "surge"
    assert top[0]["est_prev"] == 0
    assert top[0]["gain"] >= 6

    # redelivery: recommitting batch 1 (same id) changes NOTHING
    commit_batch(b1, 1, sketch, cand, WIN_MS)
    assert (
        sorted(map(tuple, merged_sketch(spark, sketch).collect()))
        == merged_before
    )


def test_trending_readstream_end_to_end(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    sketch = str(tmp_path / "sketch")
    cand = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, [(1, 100, "aa bb"), (2, 1200, "bb cc cc")]).coalesce(
        1
    ).write.mode("append").parquet(inbox)
    stream_trending_tokens(
        spark, inbox, sketch, cand, ckpt, win_ms=WIN_MS, available_now=True
    )
    rows = trending_tokens(spark, sketch, cand, win=1, top_k=2).collect()
    assert rows[0]["item"] == "cc" and rows[0]["gain"] == 2
