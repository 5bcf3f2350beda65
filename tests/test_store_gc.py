"""Orphan-delta GC (Iceberg expire_snapshots/remove_orphan_files
analog): compaction leftovers and crashed-writer partials are
collectable after the age margin; committed snapshots are never
touched; young orphans survive."""

import os


def test_store_gc_orphans(spark, tmp_path):
    from walker_spark.sources.store import FrontierStore

    store = FrontierStore(spark, str(tmp_path / "store"), num_buckets=4)
    from walker_spark.plans import schemas

    # orphan GC is manifest/directory mechanics, so drive it with
    # empty-schema deltas (0-row deltas leave dirs with _SUCCESS only)
    # plus a fake crashed-writer delta carrying a data file
    table = sorted(schemas.TABLES)[0]
    df = spark.createDataFrame([], schemas.TABLES[table])
    store.append(table, df)
    store.append(table, df)
    v_before = store.version(table)
    store.compact(table)  # old deltas now unreferenced

    tdir = os.path.join(str(tmp_path / "store"), table)
    # crashed writer: a delta dir never referenced by any manifest
    crashed = os.path.join(tdir, "d-999999-deadbeef")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-0.parquet"), "wb") as f:
        f.write(b"x" * 128)

    live = set(store._load_manifest(table)["deltas"])
    plan = store.gc_plan(table, min_age_s=0.0)
    planned = {p["delta"] for p in plan}
    assert "d-999999-deadbeef" in planned
    assert planned.isdisjoint(live)
    # the crashed delta's bytes are accounted
    assert next(p for p in plan if p["delta"] == "d-999999-deadbeef")["bytes"] == 128

    # age margin: nothing is young-collected
    assert store.gc_plan(table, min_age_s=3600.0) == []

    removed = store.gc_orphans(table, min_age_s=0.0)
    assert {p["delta"] for p in removed} == planned
    assert not os.path.exists(crashed)
    # committed snapshot unaffected, version unchanged by GC
    assert store.read(table).count() == 0
    assert store.version(table) == v_before + 1
    # idempotent: nothing left to collect
    assert store.gc_plan(table, min_age_s=0.0) == []
