"""Change-rate estimation (Cho & Garcia-Molina recrawl policy):
transition counting, ppm/interval integer laws, single-observation
default, clamping, equal-timestamp determinism."""

import datetime as dt

import pytest


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_change_rates_laws(spark):
    from walker_spark.operators.recrawl import change_rate_estimates

    hist = [
        # u1: 5 obs over 40 min, keys a a b b c -> 2 changes
        ("u1", _ts(0), "a"),
        ("u1", _ts(10), "a"),
        ("u1", _ts(20), "b"),
        ("u1", _ts(30), "b"),
        ("u1", _ts(40), "c"),
        # u2: never changes -> suggested = span clamped to max
        ("u2", _ts(0), "x"),
        ("u2", _ts(1), "x"),
        # u3: single observation -> no evidence -> max interval
        ("u3", _ts(0), "y"),
    ]
    df = spark.createDataFrame(hist, "url string, ts timestamp, content_key string")
    got = {
        r["url"]: r.asDict()
        for r in change_rate_estimates(
            df, min_interval_ms=5_000, max_interval_ms=3_600_000
        ).collect()
    }
    u1 = got["u1"]
    assert (u1["n_obs"], u1["n_changes"]) == (5, 2)
    assert u1["change_ppm"] == 2 * 1_000_000 // 4
    assert u1["mean_interval_ms"] == 40 * 60_000 // 4
    assert u1["suggested_interval_ms"] == 40 * 60_000 // 2
    assert u1["next_fetch_ms"] == u1["suggested_interval_ms"] + int(
        _ts(40).replace(tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    u2 = got["u2"]
    assert (u2["n_changes"], u2["change_ppm"]) == (0, 0)
    # span 60_000 ms / max(0,1)=1 -> 60_000, within clamp
    assert u2["suggested_interval_ms"] == 60_000
    u3 = got["u3"]
    assert (u3["n_obs"], u3["suggested_interval_ms"]) == (1, 3_600_000)
    assert u3["mean_interval_ms"] == 0


def test_change_rates_clamp_and_tie_determinism(spark):
    from walker_spark.operators.recrawl import change_rate_estimates

    # every visit changes, 1s apart -> raw suggest 1000ms, clamped up
    fast = [(f"f", _ts(0) + dt.timedelta(seconds=i), f"k{i}") for i in range(5)]
    # equal timestamps: key tiebreak orders deterministically (a,b ->
    # exactly one change regardless of input row order)
    ties = [("t", _ts(0), "b"), ("t", _ts(0), "a")]
    df = spark.createDataFrame(
        fast + ties, "url string, ts timestamp, content_key string"
    )
    got = {
        r["url"]: r.asDict()
        for r in change_rate_estimates(
            df, min_interval_ms=10_000, max_interval_ms=100_000
        ).collect()
    }
    assert got["f"]["suggested_interval_ms"] == 10_000
    assert got["t"]["n_changes"] == 1

    with pytest.raises(ValueError):
        change_rate_estimates(df, min_interval_ms=0)


def test_crawl_budget_funds_most_active_first(spark):
    import random

    from walker_spark.operators.recrawl import crawl_budget

    rows = [
        # (url, change_ppm, n_obs, suggested_interval_ms)
        ("u_hot", 900000, 10, 1000),    # cost 100
        ("u_warm", 500000, 10, 2000),   # cost 50
        ("u_cool", 100000, 10, 10000),  # cost 10
        ("u_cold", 0, 10, 100000),      # cost 1
    ]
    rates = spark.createDataFrame(
        rows,
        "url string, change_ppm long, n_obs long,"
        " suggested_interval_ms long",
    )
    got = {
        r["url"]: (r["cost_fetches"], r["granted_interval_ms"], r["demoted"])
        for r in crawl_budget(
            rates, budget_fetches=155, window_ms=100000,
            fallback_interval_ms=999999,
        ).collect()
    }
    # hot (100) + warm (50) fit in 155; cool (10) would cross -> strict
    # boundary demotes it AND everything after
    assert got["u_hot"] == (100, 1000, 0)
    assert got["u_warm"] == (50, 2000, 0)
    assert got["u_cool"] == (10, 999999, 1)
    assert got["u_cold"] == (1, 999999, 1)

    # randomized parity vs a plain sorted prefix sum
    rng = random.Random(0xB0)
    rows2 = [
        (f"u{i:03d}", rng.randrange(0, 1000000), rng.randint(2, 50),
         rng.choice([1000, 2000, 5000, 10000, 50000]))
        for i in range(200)
    ]
    budget = 3000
    got2 = {
        r["url"]: (r["granted_interval_ms"], r["demoted"])
        for r in crawl_budget(
            spark.createDataFrame(
                rows2,
                "url string, change_ppm long, n_obs long,"
                " suggested_interval_ms long",
            ),
            budget_fetches=budget,
            window_ms=100000,
            fallback_interval_ms=777,
        ).collect()
    }
    # PREFIX semantics: the budget funds a maximal prefix of the
    # activity ranking — no greedy fill-in past the first crossing
    # (fill-in would fund a less-active URL past a starved
    # more-active one)
    cum = 0
    want = {}
    for u, ppm, n, sug in sorted(
        rows2, key=lambda r: (-r[1], -r[2], r[0])
    ):
        cost = 100000 // sug
        want[u] = (sug, 0) if cum + cost <= budget else (777, 1)
        cum += cost
    assert got2 == want
