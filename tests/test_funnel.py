"""Funnel operators vs a pure-Python reference of the documented
first-touch semantics, randomized + hand-built edge cases."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from walker_spark.operators.funnel import funnel_counts, funnel_users

STEPS = ("view", "click", "signup", "purchase")


def ref_funnel(rows, steps, span=None):
    per = defaultdict(list)
    for u, ms, i, t in rows:
        if t in steps:
            per[u].append((ms, i, t))
    out = {}
    for u, evs in per.items():
        lvl, t1 = 0, 0
        for ms, i, t in sorted(evs):
            if lvl < len(steps) and t == steps[lvl] and (
                lvl == 0 or span is None or ms - t1 <= span
            ):
                lvl += 1
                if lvl == 1:
                    t1 = ms
        out[u] = (lvl, t1 if lvl > 0 else -1)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, ms, i, t) for u, ms, i, t in rows],
        "user_id long, ms long, event_id long, event_type string",
    ).select(
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "event_id",
        "event_type",
    )


def _got(spark, rows, span=None):
    return {
        r["user_id"]: (r["level"], r["entered_ms"])
        for r in funnel_users(_df(spark, rows), STEPS, span_ms=span).collect()
    }


def test_funnel_order_matters(spark):
    rows = [
        # u1 completes in order
        (1, 100, 1, "view"), (1, 200, 2, "click"),
        (1, 300, 3, "signup"), (1, 400, 4, "purchase"),
        # u2 has everything but clicks BEFORE viewing -> stuck at 1
        (2, 100, 5, "click"), (2, 200, 6, "view"),
        (2, 50, 7, "purchase"),
        # u3 never views (only later steps) -> level 0, no anchor
        (3, 100, 8, "click"), (3, 200, 9, "purchase"),
        # u4 non-step events only are filtered upstream; a lone view
        (4, 700, 10, "view"), (4, 700, 11, "error"),
    ]
    got = _got(spark, rows)
    assert got[1] == (4, 100)
    assert got[2] == (1, 200)
    assert got[3] == (0, -1)
    assert got[4] == (1, 700)


def test_funnel_span_window_cuts(spark):
    rows = [
        (1, 0, 1, "view"), (1, 500, 2, "click"), (1, 2000, 3, "signup"),
        # no restart: the second view at 1500 is NOT a new anchor
        (2, 0, 4, "view"), (2, 1500, 5, "view"), (2, 1600, 6, "click"),
    ]
    got = _got(spark, rows, span=1000)
    assert got[1] == (2, 0)   # signup at 2000 falls outside the window
    assert got[2] == (1, 0)   # first-touch anchor, click too late
    # without the window both progress
    got2 = _got(spark, rows)
    assert got2[1] == (3, 0) and got2[2] == (2, 0)


def test_funnel_ties_break_by_event_id(spark):
    # same millisecond: (ms, id) order decides -> view(id=1) precedes
    # click(id=2), so the chain completes
    rows = [(1, 100, 1, "view"), (1, 100, 2, "click")]
    assert _got(spark, rows)[1] == (2, 100)
    # reversed ids: click sorts first, view anchors after -> level 1
    rows2 = [(1, 100, 2, "view"), (1, 100, 1, "click")]
    assert _got(spark, rows2)[1] == (1, 100)


def test_funnel_randomized_vs_reference(spark):
    rng = random.Random(0xF0)
    types = list(STEPS) + ["error"]
    rows = []
    eid = 0
    for u in range(60):
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (u, rng.randrange(0, 5000), eid, rng.choice(types))
            )
            eid += 1
    for span in (None, 800):
        got = _got(spark, rows, span=span)
        assert got == ref_funnel(rows, STEPS, span=span)


def test_funnel_counts_rollup(spark):
    rows = [
        (1, 100, 1, "view"), (1, 200, 2, "click"), (1, 300, 3, "signup"),
        (2, 100, 4, "view"), (2, 200, 5, "click"),
        (3, 100, 6, "view"),
        (4, 100, 7, "click"),  # level 0
    ]
    got = {
        r["step"]: (r["step_name"], r["users"], r["conversion_ppm"])
        for r in funnel_counts(_df(spark, rows), STEPS).collect()
    }
    assert got[1] == ("view", 3, 1000000)
    assert got[2] == ("click", 2, 666666)
    assert got[3] == ("signup", 1, 333333)
    assert got[4] == ("purchase", 0, 0)  # zero-user steps still emitted


def test_funnel_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        funnel_users(_df(spark, []), ())


# ---------------------------------------------------------------------------
# Markov transition model
# ---------------------------------------------------------------------------


def _tm_rows(seqs):
    """seqs: {user: [state, ...]} -> event rows (user, type, ts_ms, id)."""
    rows, eid = [], 0
    for u, states in seqs.items():
        for i, s in enumerate(states):
            rows.append((u, s, 1_700_000_000_000 + i * 1000, eid))
            eid += 1
    return rows


def _tm_df(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ms long, event_id long"
    )
    return df.select(
        "user_id",
        "event_type",
        (F.col("ms") / 1000).cast("timestamp").alias("ts"),
        "event_id",
    )


def test_transition_model_planted(spark):
    from walker_spark.operators.funnel import transition_model

    seqs = {1: ["a", "b", "a", "b"], 2: ["a", "a"], 3: ["b"]}
    got = {
        (r["src"], r["dst"]): (r["cnt"], r["src_total"], r["p_ppm"])
        for r in transition_model(_tm_df(spark, _tm_rows(seqs))).collect()
    }
    # pairs: u1 a->b, b->a, a->b; u2 a->a; u3 none
    assert got == {
        ("a", "b"): (2, 3, 666666),
        ("a", "a"): (1, 3, 333333),
        ("b", "a"): (1, 1, 1000000),
    }


def test_transition_model_randomized_vs_reference(spark):
    from walker_spark.operators.funnel import top_transitions, transition_model

    rng = random.Random(23)
    seqs = {
        u: [rng.choice("pqrs") for _ in range(rng.randrange(0, 12))]
        for u in range(40)
    }
    cnt = defaultdict(int)
    for states in seqs.values():
        for a, b in zip(states, states[1:]):
            cnt[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in cnt.items():
        tot[a] += n
    model = transition_model(_tm_df(spark, _tm_rows(seqs)))
    got = {(r["src"], r["dst"]): r for r in model.collect()}
    assert set(got) == set(cnt)
    for key, r in got.items():
        assert r["cnt"] == cnt[key]
        assert r["src_total"] == tot[key[0]]
        assert r["p_ppm"] == cnt[key] * 1_000_000 // tot[key[0]]
    # top-k: rank/tie-break parity with the reference ordering
    top = top_transitions(model, k=2)
    by_src = defaultdict(list)
    for r in top.collect():
        by_src[r["src"]].append((r["rank"], r["dst"], r["cnt"]))
    for src, rows in by_src.items():
        ref = sorted(
            ((d, n) for (s, d), n in cnt.items() if s == src),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        assert sorted(rows) == [
            (i + 1, d, n) for i, (d, n) in enumerate(ref)
        ]


def test_top_transitions_validates(spark):
    from walker_spark.operators.funnel import top_transitions, transition_model

    model = transition_model(_tm_df(spark, _tm_rows({1: ["a", "b"]})))
    with pytest.raises(ValueError):
        top_transitions(model, k=0)


def test_retention_cohorts_planted(spark):
    from walker_spark.operators.funnel import retention_cohorts

    day = 86_400_000
    rows = []
    eid = 0
    # users 1,2: first active period 0; user 1 returns periods 1,3;
    # user 2 returns period 1. user 3: first active period 2 only.
    for u, periods in {1: [0, 1, 3], 2: [0, 0, 1], 3: [2]}.items():
        for p in periods:
            rows.append((u, "view", p * 7 * day + u * 1000, eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ms long, event_id long"
    ).select(
        "user_id",
        "event_type",
        (F.col("ms") / 1000).cast("timestamp").alias("ts"),
        "event_id",
    )
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_users"],
            r["cohort_size"],
            r["retention_ppm"],
        )
        for r in retention_cohorts(df, period_days=7).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1_000_000),
        (0, 1): (2, 2, 1_000_000),
        (0, 3): (1, 2, 500_000),
        (2, 0): (1, 1, 1_000_000),
    }


def test_retention_cohorts_validates(spark):
    from walker_spark.operators.funnel import retention_cohorts

    df = spark.createDataFrame(
        [(1, "x", 0, 0)],
        "user_id long, event_type string, ts long, event_id long",
    )
    with pytest.raises(ValueError):
        retention_cohorts(df, period_days=0)


def test_top_paths_planted(spark):
    from walker_spark.operators.funnel import top_paths

    seqs = {
        1: ["a", "b", "c", "b", "c"],   # a>b>c, b>c>b, c>b>c
        2: ["a", "b", "c"],             # a>b>c
        3: ["x", "y"],                  # too short
    }
    df = _tm_df(spark, _tm_rows(seqs))
    got = [(r["rank"], r["path"], r["cnt"]) for r in top_paths(df, 3, k=3).collect()]
    assert sorted(got) == [(1, "a>b>c", 2), (2, "b>c>b", 1), (3, "c>b>c", 1)]
    with pytest.raises(ValueError):
        top_paths(df, length=1)
    with pytest.raises(ValueError):
        top_paths(df, k=0)
