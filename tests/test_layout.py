"""Z-order layout keys: exact parity with a pure-Python Morton
interleave, and the locality property that is the entire point —
range-partitioned Z-ordered files cover tight bounding boxes in BOTH
dimensions, unsorted files don't."""

import random

import pytest
from pyspark.sql import functions as F

from walker_spark.operators.layout import zorder_keys, zorder_layout

BITS = 8


def _py_zkey(vals, bounds, bits=BITS):
    n = len(vals)
    key = 0
    for i, (v, (mn, mx)) in enumerate(zip(vals, bounds)):
        s = 0 if v is None else (v - mn) * ((1 << bits) - 1) // max(1, mx - mn)
        for j in range(bits):
            key |= ((s >> j) & 1) << (j * n + i)
    return key


def test_zorder_keys_match_python(spark):
    rng = random.Random(5)
    rows = [
        (i, rng.randint(-500, 10_000), rng.randint(0, 3_000_000))
        for i in range(400)
    ] + [(400, None, 7)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"]: r["zkey"] for r in zorder_keys(df, ["x", "y"], bits=BITS).collect()}
    xs = [x for _, x, _ in rows if x is not None]
    ys = [y for _, _, y in rows]
    bounds = [(min(xs), max(xs)), (min(ys), max(ys))]
    want = {i: _py_zkey((x, y), bounds) for i, x, y in rows}
    assert got == want


def test_zorder_layout_locality(spark):
    rng = random.Random(9)
    rows = [(rng.randint(0, 1 << 20), rng.randint(0, 1 << 20)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "x long, y long")

    def bbox_cost(pdf_rows):
        # sum over partitions of the bounding-box half-perimeter:
        # proxy for "how much of each dim a file's min/max spans"
        by_part = {}
        for p, x, y in pdf_rows:
            by_part.setdefault(p, []).append((x, y))
        tot = 0
        for pts in by_part.values():
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            tot += (max(xs) - min(xs)) + (max(ys) - min(ys))
        return tot

    z = (
        zorder_layout(df, ["x", "y"], bits=10, num_partitions=64)
        .select(F.spark_partition_id().alias("p"), "x", "y")
        .collect()
    )
    base = (
        df.repartition(64)
        .select(F.spark_partition_id().alias("p"), "x", "y")
        .collect()
    )
    z_cost = bbox_cost([tuple(r) for r in z])
    b_cost = bbox_cost([tuple(r) for r in base])
    # hash-partitioned files span ~the full range in both dims;
    # z-ordered files must be dramatically tighter
    assert z_cost < b_cost / 3, (z_cost, b_cost)


def test_zorder_validates(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_keys(df, ["x"])
    with pytest.raises(ValueError):
        zorder_keys(df, ["x", "y"], bits=40)


def _py_compaction(files, target):
    # files: list of (part, path, bytes)
    out = {}
    by_part = {}
    for part, path, b in files:
        by_part.setdefault(part, []).append((path, b))
    for part, fs in by_part.items():
        fs.sort()
        cum = 0
        groups = {}
        for path, b in fs:
            gid = cum // target
            groups.setdefault(gid, []).append((path, b))
            cum += b
        for gid, members in groups.items():
            gb = sum(b for _, b in members)
            for path, b in members:
                out[(part, path)] = (
                    b, gid, len(members), gb, len(members) > 1
                )
    return out


def test_compaction_plan_matches_python(spark):
    from walker_spark.operators.layout import compaction_plan

    rng = random.Random(3)
    files = [
        (f"p{i % 3}", f"f{i:03d}", rng.choice([10, 40, 90, 300]))
        for i in range(120)
    ] + [("p9", "huge", 10_000)]  # oversized single file: own group
    df = spark.createDataFrame(files, "part string, path string, bytes long")
    got = {
        (r["part"], r["path"]): (
            r["bytes"], r["group_id"], r["group_files"],
            r["group_bytes"], r["needs_rewrite"],
        )
        for r in compaction_plan(
            df, ["part"], target_bytes=200
        ).collect()
    }
    assert got == _py_compaction(files, 200)
    assert got[("p9", "huge")][4] is False  # oversized file left alone

    with pytest.raises(ValueError):
        compaction_plan(df, ["part"], target_bytes=0)


def test_table_diff_cdc(spark):
    from walker_spark.operators.layout import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", None)],
        "k long, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "cc", 31), (4, "d", None), (5, "e", 50)],
        "k long, s string, v int",
    )
    got = {
        r["k"]: (r["change"], list(r["changed_cols"]))
        for r in table_diff(old, new, ["k"]).collect()
    }
    # 1 deleted, 2 unchanged (omitted), 3 both cols changed, 4 has a
    # NULL that null-safe equality treats as equal (omitted), 5 inserted
    assert got == {
        1: ("delete", []),
        3: ("update", ["s", "v"]),
        5: ("insert", []),
    }

    only_v = {
        r["k"]: r["change"]
        for r in table_diff(old, new, ["k"], compare_cols=["v"]).collect()
    }
    assert only_v == {1: "delete", 3: "update", 5: "insert"}

    with pytest.raises(ValueError):
        table_diff(old, new, [])


# ---------------------------------------------------------------------------
# zone maps + range pruning
# ---------------------------------------------------------------------------


def test_zone_map_prune_goldens(spark):
    from pyspark.sql import functions as F

    from walker_spark.operators.layout import zone_map_prune, zone_maps

    # 4 files x 10 rows; values correlated with file id, one scrambled
    # file overlapping everything
    rows = [(f, f * 10 + i) for f in range(3) for i in range(10)]
    rows += [(3, v) for v in (0, 29)]  # wide zone
    df = spark.createDataFrame(rows, "file long, v long")
    zm = zone_maps(df, "file", "v")
    got_zm = {r["file"]: (r["n_rows"], r["vmin"], r["vmax"]) for r in zm.collect()}
    assert got_zm == {0: (10, 0, 9), 1: (10, 10, 19), 2: (10, 20, 29), 3: (2, 0, 29)}

    bounds = spark.createDataFrame([(10, 19)], "lo long, hi long")
    got = {
        r["file"]: (r["must_scan"], r["fully_covered"])
        for r in zone_map_prune(zm, bounds).collect()
    }
    # file 1 fully covered; file 3 overlaps but not covered; 0/2 skip
    assert got == {0: (0, 0), 1: (1, 1), 2: (0, 0), 3: (1, 0)}

    # bounds riding the plan as a broadcast aggregate (no collect)
    b2 = df.agg(
        F.min("v").alias("lo"), (F.min("v") + F.lit(9)).alias("hi")
    )
    got2 = {r["file"]: r["must_scan"] for r in zone_map_prune(zm, b2).collect()}
    assert got2 == {0: 1, 1: 0, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# clustering report / stats (sweep-line overlap metric)
# ---------------------------------------------------------------------------


def _zones(spark, rows, parts=False):
    schema = (
        "tbl string, file string, n_rows long, vmin long, vmax long"
        if parts
        else "file string, n_rows long, vmin long, vmax long"
    )
    return spark.createDataFrame(rows, schema)


def test_clustering_report_hand_case(spark):
    from walker_spark.operators.layout import (
        clustering_report,
        clustering_stats,
    )

    z = _zones(
        spark,
        [
            ("A", 10, 0, 10),
            ("B", 10, 5, 15),
            ("C", 10, 20, 30),
            ("D", 10, 30, 40),   # closed intervals: touching at 30 overlaps
            ("E", 10, 100, 100),
            ("N", 10, None, None),  # stats-absent file excluded
        ],
    )
    got = {r["file"]: r["overlaps"] for r in clustering_report(z).collect()}
    assert got == {"A": 1, "B": 1, "C": 1, "D": 1, "E": 0}
    s = clustering_stats(z).collect()[0]
    assert s["n_files"] == 5 and s["max_depth"] == 2
    assert s["max_overlaps"] == 1
    assert s["avg_overlaps_ppm"] == (4 * 1000000) // 5


def test_clustering_randomized_vs_brute(spark):
    from walker_spark.operators.layout import (
        clustering_report,
        clustering_stats,
    )

    rng = random.Random(0xC1)
    rows = []
    for i in range(120):
        lo = rng.randint(0, 500)
        rows.append((f"f{i:03d}", 1, lo, lo + rng.randint(0, 80)))
    got = {
        r["file"]: r["overlaps"]
        for r in clustering_report(_zones(spark, rows)).collect()
    }
    want = {
        f: sum(
            1
            for g, _, lo2, hi2 in rows
            if g != f and lo2 <= hi and hi2 >= lo
        )
        for f, _, lo, hi in rows
    }
    assert got == want
    # max_depth == max pointwise cover over all interval endpoints
    depth = max(
        sum(1 for _, _, lo2, hi2 in rows if lo2 <= v <= hi2)
        for _, _, v, _ in rows
    )
    assert clustering_stats(_zones(spark, rows)).collect()[0][
        "max_depth"
    ] == depth


def test_clustering_partitioned_sweeps_independent(spark):
    from walker_spark.operators.layout import clustering_report

    z = _zones(
        spark,
        [
            ("t1", "A", 1, 0, 10),
            ("t1", "B", 1, 5, 15),
            ("t2", "A", 1, 0, 10),   # same file id, other partition
            ("t2", "C", 1, 50, 60),
        ],
        parts=True,
    )
    got = {
        (r["tbl"], r["file"]): r["overlaps"]
        for r in clustering_report(z, partition_cols=("tbl",)).collect()
    }
    assert got == {
        ("t1", "A"): 1,
        ("t1", "B"): 1,
        ("t2", "A"): 0,
        ("t2", "C"): 0,
    }
