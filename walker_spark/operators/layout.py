"""Multi-dimensional data-layout keys: Z-order (Morton) curve
interleaving for co-clustering rows on several dimensions at once.

Why this is an engine feature, not a query: at 100 TB the win from a
scan is mostly FILE SKIPPING — parquet footers carry per-file min/max
for every column, and the planner prunes files whose range can't
match the predicate. A table range-partitioned on one column skips
perfectly on that column and not at all on any other; writing the
table ordered by a Z-key makes every file a tight HYPER-RECTANGLE in
all the interleaved dimensions, so predicates on ANY of them prune
(the Delta/Iceberg `OPTIMIZE ZORDER BY` pattern — implemented here
with plain public Spark: repartitionByRange + sortWithinPartitions).

All math is integer (grid scaling uses DECIMAL(38,0) products with
integer ``div`` so web-scale value ranges can't overflow), so the
DuckDB oracle replays keys bit-for-bit, and the whole key expression
is JVM whole-stage-codegen — no Python, no shuffle beyond the final
range partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Max bits per dimension: total interleaved key must fit a BIGINT.
_MAX_TOTAL_BITS = 62


def zorder_keys(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> DataFrame:
    """Add a ``zkey`` BIGINT column: the Morton interleave of each
    dimension scaled onto a ``2^bits`` grid between its corpus min and
    max. Scaling: ``(v - mn) * (2^bits - 1) div max(1, mx - mn)`` —
    exact integer, computed against per-column min/max that ride the
    plan as ONE broadcast one-row aggregate (no collect, no second
    job). Bit ``j`` of dimension ``i`` lands at key bit
    ``j * n_dims + i``.

    Input columns must be integral (cast timestamps to epoch ms
    first). NULLs map below the grid (bit pattern 0) so they cluster
    together in the first file(s)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 dimensions")
    if bits < 1 or bits * n > _MAX_TOTAL_BITS:
        raise ValueError(f"bits*dims must be in [1, {_MAX_TOTAL_BITS}]: {bits}x{n}")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"_mx_{c}"))
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    # scaled expressions go through expr strings so `div` (integer
    # decimal division) is available
    sel = [df[c2] for c2 in df.columns]
    zparts = []
    for i, c in enumerate(cols):
        s_expr = (
            f"CAST((CAST(`{c}` AS DECIMAL(38,0)) - CAST(`_mn_{c}` AS DECIMAL(38,0)))"
            f" * {(1 << bits) - 1}"
            f" div CAST(greatest(`_mx_{c}` - `_mn_{c}`, 1) AS DECIMAL(38,0))"
            f" AS BIGINT)"
        )
        null_safe = f"coalesce({s_expr}, 0)"
        zparts.extend(
            f"(shiftleft(shiftright({null_safe}, {j}) & 1, {j * n + i}))"
            for j in range(bits)
        )
    zkey = F.expr(" + ".join(zparts)).cast("long").alias("zkey")
    return out.select(*sel, zkey)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    num_partitions: int = 32,
) -> DataFrame:
    """The write-side layout op: rows range-partitioned and sorted by
    the Z-key, so each output file covers a tight hyper-rectangle in
    every interleaved dimension (parquet min/max footers then prune on
    any of them). ONE exchange (the range partition); the sort is
    within partitions only — never a global sort."""
    keyed = zorder_keys(df, cols, bits=bits)
    return keyed.repartitionByRange(num_partitions, "zkey").sortWithinPartitions(
        "zkey"
    )


def compaction_plan(
    files: DataFrame,
    partition_cols: Sequence[str],
    path_col: str = "path",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Plan small-file compaction for a table's file inventory: within
    each partition, files (ordered by path — deterministic) are packed
    greedily into rewrite groups of ~``target_bytes`` by integer
    prefix-sum bucketing::

        group_id = (cumulative_bytes_before_this_file) div target

    Returns one row per file: ``(partition..., path, bytes, group_id,
    group_files, group_bytes, needs_rewrite)`` — ``needs_rewrite`` is
    false for groups of one file (already compact; an oversized file
    is its own group and is left alone). Pure integer, exact oracle.

    Scale shape: the window partitions by the TABLE partition — file
    counts per partition are metadata-scale (thousands), never data
    volume, so this whole plan is a metadata query; the expensive part
    (the rewrite itself) happens downstream, one task per group_id.
    This is the maintenance half of Z-ordering: `zorder_layout` writes
    good files, `compaction_plan` finds the partitions where
    accumulated small appends have degraded them."""
    from pyspark.sql import Window

    if target_bytes < 1:
        raise ValueError(f"target_bytes must be positive: {target_bytes}")
    keyed = files.select(
        *partition_cols,
        F.col(path_col).alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.expr(
            f"CAST((sum(`{bytes_col}`) OVER (PARTITION BY "
            + ", ".join(f"`{c}`" for c in partition_cols)
            + f" ORDER BY `{path_col}` ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND CURRENT ROW) - `{bytes_col}`) div {target_bytes} AS BIGINT)"
        ).alias("group_id"),
    )
    wg = Window.partitionBy(*partition_cols, "group_id")
    return keyed.select(
        *partition_cols,
        "path",
        "bytes",
        "group_id",
        F.count(F.lit(1)).over(wg).cast("long").alias("group_files"),
        F.sum("bytes").over(wg).cast("long").alias("group_bytes"),
        (F.count(F.lit(1)).over(wg) > 1).alias("needs_rewrite"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table — the CDC
    primitive behind incremental downstream refresh (what
    Delta/Iceberg CDF emits, computed here from any two snapshots):
    one row per changed key with ``change = 'insert' | 'delete' |
    'update'`` and ``changed_cols`` (sorted array, non-empty only for
    updates). Unchanged keys are omitted (sparse contract).

    Shape: ONE full-outer hash equi-join on the key — both sides
    shuffle once on the same key (co-partitioned at write time this
    degenerates to a zipped scan), per-column comparison is codegen
    null-safe equality (``<=>``), and the changed_cols array is built
    by filtering a constant array literal — no second pass, no Python.
    Keys duplicated within a snapshot raise upstream concerns, not
    handled here (document-keyed tables are unique by contract)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    cmp_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in key_cols]
    )
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, list(key_cols), "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                        F.lit(c),
                    )
                    for c in cmp_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
    )
    return (
        j.select(*key_cols, change.alias("change"), changed.alias("changed_cols"))
        .filter(F.col("change").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change") == "update", F.col("changed_cols")).otherwise(
                F.array().cast("array<string>")
            ),
        )
    )


def zone_maps(
    df: DataFrame,
    file_col: str,
    value_col: str,
) -> DataFrame:
    """Per-file zone maps (min/max/rowcount) for one column —
    ``(file, n_rows, vmin, vmax)``. The statistics tier every lakehouse
    format keeps per data file (parquet footer stats, Iceberg/Delta
    manifests); ONE two-phase aggregate keyed on the file id,
    metadata-scale output regardless of data volume."""
    return (
        df.select(
            F.col(file_col).alias("file"),
            F.col(value_col).cast("long").alias("_v"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_v").alias("vmin"),
            F.max("_v").alias("vmax"),
        )
    )


def file_blooms(
    df: DataFrame,
    file_col: str,
    value_col: str,
    m_bits: int = 256,
    k: int = 3,
) -> DataFrame:
    """Per-file Bloom index over a point-lookup column — ``(file,
    bit)`` distinct rows, the equality-predicate complement to
    :func:`zone_maps` (parquet column-index bloom filters / Iceberg
    puffin blobs): zone maps skip files on RANGE predicates, which is
    useless for a high-cardinality unordered column (every file's
    [min, max] spans the domain); a per-file bloom skips on POINT
    predicates regardless of layout.

    Same sketch contract as ``sketches.bloom_bits``: positions are
    ``md5_u32(v || ':' || j) mod m_bits``, rows not packed bitmaps, so
    the index is mergeable by UNION-DISTINCT (rewriting two files into
    one ORs their blooms for free), persistable as a metadata table,
    and cross-engine exact INCLUDING its false positives. Build shape:
    k-way projection fan-out then one distinct keyed on (file, bit) —
    map-side partials collapse repeats before the exchange; at most
    ``m_bits`` rows per file regardless of file row count."""
    from walker_spark.operators.sketches import _md5_u32

    if m_bits < 2 or k < 1:
        raise ValueError("need m_bits >= 2 and k >= 1")
    item = F.col(value_col).cast("string")
    return df.select(
        F.col(file_col).alias("file"),
        F.explode(
            F.array(
                *[
                    (_md5_u32(F.concat(item, F.lit(f":{j}"))) % m_bits)
                    for j in range(k)
                ]
            )
        ).alias("bit"),
    ).distinct()


def bloom_prune(
    blooms: DataFrame,
    probes: DataFrame,
    value_col: str = "key",
    m_bits: int = 256,
    k: int = 3,
) -> DataFrame:
    """Evaluate point-lookup keys against a :func:`file_blooms` index:
    one row per ``(file, key)`` with ``must_scan`` BIGINT 0/1 — set
    iff ALL ``k`` positions of the key are present in that file's
    bloom. NO false negative is possible (a file containing the key
    always must_scan — the planner guarantee), false positives at the
    standard rate and deterministic here (md5), so the oracle replays
    them exactly.

    Shape: ``probes`` is the predicate's key list — human-scale, so
    it broadcasts; the fan-out (k rows per key) hash-joins the bloom
    table on ``bit`` (metadata-scale: <= m_bits rows per file) and a
    per-(file, key) count compares to ``k``. Files whose bloom shares
    no bit with the key fall out of the join and surface through the
    base file x key frame with must_scan = 0. Keys must be distinct
    (a predicate's literal list is)."""
    item = F.col(value_col).cast("string")
    fan = probes.select(
        F.col(value_col).alias("key"),
        F.explode(
            F.array(
                *[
                    (_bloom_pos(item, j, m_bits))
                    for j in range(k)
                ]
            )
        ).alias("bit"),
    )
    hits = (
        blooms.join(F.broadcast(fan), "bit")
        .groupBy("file", "key")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    base = (
        blooms.select("file")
        .distinct()
        .crossJoin(F.broadcast(probes.select(F.col(value_col).alias("key"))))
    )
    return base.join(hits, ["file", "key"], "left").select(
        "file",
        "key",
        (F.coalesce(F.col("_hits"), F.lit(0)) == F.lit(k))
        .cast("long")
        .alias("must_scan"),
    )


def _bloom_pos(item: Column, j: int, m_bits: int) -> Column:
    from walker_spark.operators.sketches import _md5_u32

    return _md5_u32(F.concat(item, F.lit(f":{j}"))) % m_bits


def zone_map_prune(
    zmaps: DataFrame,
    bounds: DataFrame,
) -> DataFrame:
    """Evaluate a closed range predicate ``[lo, hi]`` against zone
    maps: per file, ``must_scan`` (zone overlaps the range — the file
    cannot be skipped) and ``fully_covered`` (zone inside the range —
    the predicate is true for every row, so it can be dropped at scan
    time). ``bounds`` is a ONE-ROW ``(lo, hi)`` frame — typically a
    broadcast aggregate derived in the same plan, so no driver-side
    collect decides the predicate.

    The planner's arithmetic is what `zorder_layout` exists to
    improve: after a Z-order/range rewrite, zones are tight and
    ``sum(must_scan)`` collapses; on an uncorrelated layout every file
    overlaps. Output: ``(file, n_rows, vmin, vmax, must_scan,
    fully_covered)`` with the flags BIGINT 0/1 — exact oracle."""
    return zmaps.crossJoin(F.broadcast(bounds)).select(
        "file",
        "n_rows",
        "vmin",
        "vmax",
        ((F.col("vmax") >= F.col("lo")) & (F.col("vmin") <= F.col("hi")))
        .cast("long")
        .alias("must_scan"),
        ((F.col("vmin") >= F.col("lo")) & (F.col("vmax") <= F.col("hi")))
        .cast("long")
        .alias("fully_covered"),
    )


def _clustering_events(
    zmaps: DataFrame, partition_cols: Sequence[str]
) -> DataFrame:
    """Sweep-line state over zone-map boundary events: one row per
    file endpoint, ordered (v, kind) with OPENs (kind 0) before
    CLOSEs (kind 1) at equal values so closed-interval overlap
    semantics are exact. Carries the running open-interval count
    (``depth``) and the two prefix counts the overlap formula needs.
    Files with NULL bounds (all-NULL value column — parquet
    stats-absent) are excluded; they can never participate in a
    range-overlap decision."""
    from pyspark.sql import Window

    z = zmaps.filter(
        F.col("vmin").isNotNull() & F.col("vmax").isNotNull()
    )
    ev = z.select(
        *partition_cols,
        "file",
        F.col("vmin").alias("v"),
        F.lit(0).alias("kind"),
    ).unionByName(
        z.select(
            *partition_cols,
            "file",
            F.col("vmax").alias("v"),
            F.lit(1).alias("kind"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy("v", "kind", "file")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if partition_cols
        else Window.orderBy("v", "kind", "file").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    is_min = (F.col("kind") == 0).cast("long")
    is_max = (F.col("kind") == 1).cast("long")
    return ev.select(
        *partition_cols,
        "file",
        "kind",
        F.sum(is_min).over(w).alias("_cum_mins"),
        # maxes strictly before the current row (a CLOSE event does
        # not count itself)
        (F.sum(is_max).over(w) - is_max).alias("_cum_maxs"),
    )


def clustering_report(
    zmaps: DataFrame, partition_cols: Sequence[str] = ()
) -> DataFrame:
    """Per-file overlap counts from zone maps — the metric behind
    every OPTIMIZE/ZORDER decision (the public analog of Snowflake's
    SYSTEM$CLUSTERING_INFORMATION): ``overlaps`` = number of OTHER
    files whose [vmin, vmax] range intersects this file's (closed
    intervals). A perfectly clustered table reports 0 everywhere; a
    fully unclustered one reports n_files-1.

    NO pairwise join: overlaps_i = #{vmin_j <= vmax_i} −
    #{vmax_j < vmin_i} − 1, both prefix counts read off ONE
    sweep-line window over 2·n_files boundary events. File
    inventories are metadata-scale; pass ``partition_cols`` (the
    compaction_plan convention) so each table partition sweeps
    independently — per-partition inventories are thousands of rows,
    so no window partition is ever data-volume sized."""
    ev = _clustering_events(zmaps, partition_cols)
    per_file = ev.groupBy(*partition_cols, "file").agg(
        F.max(F.when(F.col("kind") == 1, F.col("_cum_mins"))).alias("_t1"),
        F.max(F.when(F.col("kind") == 0, F.col("_cum_maxs"))).alias("_t2"),
    )
    z = zmaps.filter(
        F.col("vmin").isNotNull() & F.col("vmax").isNotNull()
    )
    return z.join(per_file, [*partition_cols, "file"]).select(
        *partition_cols,
        "file",
        "n_rows",
        "vmin",
        "vmax",
        (F.col("_t1") - F.col("_t2") - 1).cast("long").alias("overlaps"),
    )


def clustering_stats(
    zmaps: DataFrame, partition_cols: Sequence[str] = ()
) -> DataFrame:
    """Partition-level clustering health: ``(partition..., n_files,
    total_rows, max_depth, max_overlaps, avg_overlaps_ppm)``.
    ``max_depth`` is the sweep peak — the most files any single point
    value hits (what a point lookup must scan); ``avg_overlaps_ppm``
    is exact-integer mean overlaps × 10^6 (floor). Metadata-scale
    output: one row per table partition."""
    ev = _clustering_events(zmaps, partition_cols)
    depth = ev.groupBy(*partition_cols).agg(
        F.max(F.col("_cum_mins") - F.col("_cum_maxs")).alias("max_depth")
    )
    rep = clustering_report(zmaps, partition_cols)
    agg = rep.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.max("overlaps").alias("max_overlaps"),
        F.sum("overlaps").alias("_sum_ov"),
    )
    joined = (
        agg.join(depth, list(partition_cols)) if partition_cols
        else agg.crossJoin(F.broadcast(depth))
    )
    return joined.select(
        *partition_cols,
        "n_files",
        "total_rows",
        F.col("max_depth").cast("long").alias("max_depth"),
        F.col("max_overlaps").cast("long").alias("max_overlaps"),
        F.expr("(_sum_ov * 1000000) div n_files").alias(
            "avg_overlaps_ppm"
        ),
    )
