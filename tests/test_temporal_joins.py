"""asof_join / range_join: golden cases + randomized brute-force
parity (the operators are pure DataFrame compositions, so the
reference is a trivial O(n*m) Python double loop)."""

import datetime as dt
import random

import pytest

from walker_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _ms(ts):
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def golden(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(5), "p2"), (2, _t(7), "p3"), (3, _t(1), "p4")],
        "uid long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _t(4), 100, 1.0), (1, _t(10), 101, 2.0),
         (1, _t(10), 102, 3.0), (2, _t(8), 103, 4.0)],
        "uid long, rts timestamp, rid long, rv double",
    )
    return left, right


def test_asof_backward_golden(golden):
    left, right = golden
    got = {
        r["pid"]: (r["rid"], r["_asof_time_ms"])
        for r in asof_join(
            left, right, "uid", "ts", "rts", tiebreak="rid"
        ).collect()
    }
    # p1: two right rows tied at t=10 (inclusive) -> max tiebreak wins
    assert got == {
        "p1": (102, _ms(_t(10))),
        "p2": (100, _ms(_t(4))),
        "p3": (None, None),  # only right row is LATER
        "p4": (None, None),  # no right rows for the key
    }


def test_asof_forward_golden(golden):
    left, right = golden
    got = {
        r["pid"]: (r["rid"], r["_asof_time_ms"])
        for r in asof_join(
            left, right, "uid", "ts", "rts",
            direction="forward", tiebreak="rid",
        ).collect()
    }
    assert got == {
        "p1": (102, _ms(_t(10))),  # equal time is inclusive both ways
        "p2": (102, _ms(_t(10))),  # nearest ts is 10; max tiebreak there
        "p3": (103, _ms(_t(8))),
        "p4": (None, None),
    }


def test_asof_tolerance(golden):
    left, right = golden
    got = {
        r["pid"]: r["rid"]
        for r in asof_join(
            left, right, "uid", "ts", "rts",
            direction="forward", tolerance_ms=60_000, tiebreak="rid",
        ).collect()
    }
    # p2's nearest forward match (t=10) is 5 min away -> nulled
    assert got == {"p1": 102, "p2": None, "p3": 103, "p4": None}


def _brute_asof(lrows, rrows, direction, tolerance_ms):
    out = {}
    for key, lt, pid in lrows:
        best = None
        for rkey, rt, rid in rrows:
            if rkey != key:
                continue
            if direction == "backward":
                if rt > lt or (tolerance_ms is not None and lt - rt > tolerance_ms):
                    continue
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
            else:
                if rt < lt or (tolerance_ms is not None and rt - lt > tolerance_ms):
                    continue
                # nearest time wins; among ties max tiebreak
                if best is None or (rt, -rid) < (best[0], -best[1]):
                    best = (rt, rid)
        out[pid] = best[1] if best else None
    return out


@pytest.mark.parametrize(
    "direction,tolerance_ms",
    [("backward", None), ("forward", None), ("backward", 120_000)],
)
def test_asof_randomized(spark, direction, tolerance_ms):
    rng = random.Random(42)
    # coarse minute grid -> plenty of exact ties to exercise tiebreak
    lrows = [
        (rng.randint(0, 9), rng.randint(0, 50), f"p{i}") for i in range(200)
    ]
    rrows = [(rng.randint(0, 9), rng.randint(0, 50), i) for i in range(300)]
    left = spark.createDataFrame(
        [(k, _t(m), pid) for k, m, pid in lrows], "uid long, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(k, _t(m), rid) for k, m, rid in rrows], "uid long, rts timestamp, rid long"
    )
    got = {
        r["pid"]: r["rid"]
        for r in asof_join(
            left, right, "uid", "ts", "rts",
            direction=direction, tolerance_ms=tolerance_ms, tiebreak="rid",
        ).collect()
    }
    want = _brute_asof(
        [(k, _ms(_t(m)), pid) for k, m, pid in lrows],
        [(k, _ms(_t(m)), rid) for k, m, rid in rrows],
        direction,
        tolerance_ms,
    )
    assert got == want


def test_asof_payload_collision_raises(golden):
    left, right = golden
    with pytest.raises(ValueError):
        asof_join(
            left, right.withColumnRenamed("rid", "pid"),
            "uid", "ts", "rts",
        )


def test_range_join_randomized(spark):
    rng = random.Random(7)
    pts = [(i, rng.randint(0, 2000)) for i in range(300)]
    ivs = []
    for j in range(80):
        s = rng.randint(0, 2000)
        ivs.append((j, s, s + rng.randint(0, 300)))  # incl. empty (e == s)
    pdf = spark.createDataFrame(
        [(i, _t(m)) for i, m in pts], "pid long, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(j, _t(s), _t(e)) for j, s, e in ivs],
        "wid long, ws timestamp, we timestamp",
    )
    want = sorted(
        (i, j) for i, m in pts for j, s, e in ivs if s <= m < e
    )
    for kwargs in (
        {"bucket_ms": 3_600_000},
        {"bucket_ms": 60_000},  # bucket << interval
        {"bucket_ms": 7 * 24 * 3_600_000},  # one bucket swallows all
        {"bucket_ms": 3_600_000, "broadcast_intervals": True},
    ):
        got = sorted(
            (r["pid"], r["wid"])
            for r in range_join(pdf, idf, "ts", "ws", "we", **kwargs).collect()
        )
        assert got == want, kwargs


def test_range_join_with_keys(spark):
    rng = random.Random(11)
    pts = [(i, rng.randint(0, 3), rng.randint(0, 500)) for i in range(200)]
    ivs = [
        (j, rng.randint(0, 3), s, s + rng.randint(1, 120))
        for j, s in ((j, rng.randint(0, 500)) for j in range(40))
    ]
    pdf = spark.createDataFrame(
        [(i, g, _t(m)) for i, g, m in pts], "pid long, grp long, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(j, g, _t(s), _t(e)) for j, g, s, e in ivs],
        "wid long, grp long, ws timestamp, we timestamp",
    )
    want = sorted(
        (i, j)
        for i, g, m in pts
        for j, gg, s, e in ivs
        if g == gg and s <= m < e
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in range_join(
            pdf, idf, "ts", "ws", "we", on=["grp"], bucket_ms=1_800_000
        ).collect()
    )
    assert got == want


class TestBloomFilteredJoin:
    """bloom_filtered_join: exact parity with the plain join (incl.
    forced false positives via a tiny bit table), null/composite
    keys, left_semi mode, prebuilt-bits reuse, and the map-side plan
    shape (k broadcast LEFT-SEMI joins, no exchange on the probe side
    before them)."""

    def _frames(self, spark):
        import pyspark.sql.functions as F

        probe = spark.range(0, 3000).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("v")
        )
        build = spark.range(0, 3000, 11).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        return probe, build

    def test_parity_inner(self, spark):
        from walker_spark.operators.joins import bloom_filtered_join

        probe, build = self._frames(spark)
        got = sorted(bloom_filtered_join(probe, build, "k").collect())
        exp = sorted(probe.join(build, "k").collect())
        assert got == exp and len(exp) > 0

    def test_parity_under_false_positives(self, spark):
        from walker_spark.operators.joins import bloom_filtered_join

        probe, build = self._frames(spark)
        # m_bits=4, k=1: nearly every probe row passes the bloom —
        # the equi-join must still drop every false positive.
        got = sorted(
            bloom_filtered_join(probe, build, "k", m_bits=4, k=1).collect()
        )
        assert got == sorted(probe.join(build, "k").collect())

    def test_left_semi_and_null_composite_keys(self, spark):
        import pyspark.sql.functions as F

        from walker_spark.operators.joins import bloom_filtered_join

        probe, build = self._frames(spark)
        p2 = probe.withColumn(
            "k2", F.when(F.col("k") % 5 == 0, None).otherwise(F.col("k") % 3)
        )
        b2 = build.withColumn("k2", F.col("k") % 3)
        got = sorted(
            bloom_filtered_join(p2, b2, ["k", "k2"], how="left_semi").collect()
        )
        exp = sorted(p2.join(b2, ["k", "k2"], "left_semi").collect())
        assert got == exp and len(exp) > 0

    def test_prebuilt_bits_reuse(self, spark):
        import pyspark.sql.functions as F

        from walker_spark.operators.joins import bloom_filtered_join
        from walker_spark.operators.sketches import bloom_bits

        probe, build = self._frames(spark)
        bits = bloom_bits(
            build.select(F.col("k").cast("string").alias("_bloom_key")),
            "_bloom_key",
            m_bits=1 << 12,
            k=3,
        ).localCheckpoint()
        got = sorted(
            bloom_filtered_join(
                probe, build, "k", bits=bits, m_bits=1 << 12, k=3
            ).collect()
        )
        assert got == sorted(probe.join(build, "k").collect())

    def test_rejects_outer(self, spark):
        import pytest as _pytest

        from walker_spark.operators.joins import bloom_filtered_join

        probe, build = self._frames(spark)
        with _pytest.raises(ValueError):
            bloom_filtered_join(probe, build, "k", how="left")

    def test_plan_probe_side_map_side(self, spark):
        from walker_spark.operators.joins import bloom_filtered_join

        probe, build = self._frames(spark)
        plan = (
            bloom_filtered_join(probe, build, "k", k=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("LeftSemi") == 4
        # every semi is a broadcast hash join, never shuffled
        assert "ShuffledHashJoin LeftSemi" not in plan
        assert "SortMergeJoin LeftSemi" not in plan
