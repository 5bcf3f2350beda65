"""Time-series join operators Spark lacks as primitives: as-of join
and point-in-interval range join.

Both are expressed as compositions of built-in DataFrame ops (zero
Python in the data path) so Catalyst/AQE keep optimizing them:

- :func:`asof_join` is the canonical union+window rewrite (the same
  plan shape kdb/QuestDB/Flink use for distributed as-of): tag both
  sides, union, ONE window over the equality keys ordered by
  (time, side, tiebreak), ``last(payload, ignorenulls)`` — so each
  key's history is shuffled exactly once and never joined.
- :func:`range_join` kills the O(points x intervals) nested-loop plan
  Spark produces for a raw inequality join by bucketing time at a
  caller-chosen granularity: each interval explodes to the buckets it
  overlaps, each point has exactly ONE bucket, and the join becomes an
  equi-join on (keys, bucket) with the interval predicate as a
  residual filter — each qualifying pair is produced exactly once (no
  dedup pass) because the point's single bucket is covered by exactly
  one exploded interval row.

Reference parity note: walker has no temporal joins (SURVEY.md §2.3 —
its joins are frontier/seen-set/segment equi-joins); these cover the
event-attribution and window-rollup queries a Common-Crawl-scale
events pipeline runs downstream of the crawl.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ms(col: F.Column) -> F.Column:
    """Epoch milliseconds of a timestamp-ish column (TIMESTAMP_NTZ
    needs the explicit timestamp cast first — CLAUDE.md gotcha)."""
    return F.unix_millis(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: str,
    *,
    direction: str = "backward",
    tolerance_ms: Optional[int] = None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """For every left row, attach the single right row whose
    ``right_time`` is nearest ``left_time`` on the ``direction`` side
    (inclusive), matching on the ``on`` equality keys — left-outer
    semantics (unmatched left rows keep nulls). ``backward`` takes the
    latest right row with ``right_time <= left_time``; ``forward`` the
    earliest with ``right_time >= left_time``. Among right rows tied
    on (keys, time) the max ``tiebreak`` wins (required for a
    deterministic result if ties are possible). ``tolerance_ms``
    nulls out matches further than the given gap.

    Output: every left column, then every right column except the keys
    and ``right_time`` (which must not collide with left's names),
    plus ``_asof_time_ms`` (epoch ms of the matched right row, null if
    none).

    Scale shape: the classic distributed as-of rewrite — both sides
    union into one stream and a single window partitioned by the keys
    does the matching, so there is exactly ONE exchange (on the keys)
    and the right side's history is never self-joined or broadcast.
    At 10^10 rows the only hazard is a mega-key (one user with a huge
    history): the window still streams it on one task in sorted order
    (no state blow-up — ``last(ignorenulls)`` is O(1) per row), which
    matches kdb/Flink behavior; range-repartition + per-chunk seeding
    would shave the tail but adds a second pass for a rare shape.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    payload = [c for c in right.columns if c not in keys and c != right_time]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {clash}")

    rt_ms = _ms(F.col(right_time))
    r = right.select(
        *keys,
        rt_ms.alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
        F.struct(
            rt_ms.alias("_asof_time_ms"), *[F.col(c) for c in payload]
        ).alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        _ms(F.col(left_time)).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c) for c in left.columns if c not in keys],
    )

    # window order: nearer-in-direction right rows come later, right
    # rows sort before the left row they may serve at equal time, and
    # tied right rows put the max tiebreak last — so last(ignorenulls)
    # IS the as-of winner.
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_ord, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "_m", F.last("_rp", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)

    if tolerance_ms is not None:
        gap = (
            F.col("_t") - F.col("_m._asof_time_ms")
            if direction == "backward"
            else F.col("_m._asof_time_ms") - F.col("_t")
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(int(tolerance_ms)), F.col("_m"))
        )
    return matched.select(
        *keys,
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.col(f"_m.{c}").alias(c) for c in payload],
        F.col("_m._asof_time_ms").alias("_asof_time_ms"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_time: str,
    end_time: str,
    *,
    on: Sequence[str] = (),
    bucket_ms: int = 3_600_000,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of ``points`` to every interval that contains it:
    ``start_time <= point_time < end_time`` (half-open, the standard
    window convention), optionally also matching the ``on`` equality
    keys. Output: all point columns + all interval columns (names must
    not collide; the three time columns pass through).

    Scale shape: a raw inequality join is a BroadcastNestedLoopJoin —
    O(P x I) comparisons and a mandatory broadcast. Instead time is
    bucketed at ``bucket_ms``: every interval explodes to the buckets
    it overlaps (Generate in the scan task — rows multiply by
    ceil(len/bucket) so pick bucket_ms near the TYPICAL interval
    length), every point computes its single bucket in the scan, and
    the join is a hash equi-join on (keys, bucket) + residual interval
    predicate. Each qualifying pair appears exactly once, so no
    distinct pass. With ``broadcast_intervals`` the exploded interval
    side broadcasts (dimension-table case: zero exchange on the fact
    side); otherwise both sides shuffle once on (keys, bucket) —
    either way never a nested loop.
    """
    keys = list(on)
    clash = set(points.columns) & set(intervals.columns)
    if clash - set(keys):
        raise ValueError(f"column collision outside keys: {clash - set(keys)}")

    p_ms = _ms(F.col(point_time))
    s_ms = _ms(F.col(start_time))
    e_ms = _ms(F.col(end_time))
    b = F.lit(int(bucket_ms))

    pts = points.withColumn("_pt", p_ms).withColumn(
        "_bucket", F.floor(F.col("_pt") / b)
    )
    ivs = (
        intervals.withColumn("_s", s_ms)
        .withColumn("_e", e_ms)
        .filter(F.col("_e") > F.col("_s"))
        .withColumn(
            "_bucket",
            # half-open end: a bucket containing only _e itself never
            # qualifies, so explode to floor((_e - 1) / b)
            F.explode(
                F.sequence(
                    F.floor(F.col("_s") / b), F.floor((F.col("_e") - 1) / b)
                )
            ),
        )
    )
    if broadcast_intervals:
        ivs = F.broadcast(ivs)
    out = pts.join(ivs, keys + ["_bucket"], "inner").filter(
        (F.col("_pt") >= F.col("_s")) & (F.col("_pt") < F.col("_e"))
    )
    return out.drop("_pt", "_bucket", "_s", "_e")


def bloom_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    on: Union[str, Sequence[str]],
    *,
    m_bits: int = 1 << 20,
    k: int = 4,
    how: str = "inner",
    bits: Optional[DataFrame] = None,
) -> DataFrame:
    """Equi-join with a runtime Bloom-filter pushdown on the probe
    side (the semi-join reduction Spark's own
    ``spark.sql.optimizer.runtimeFilter.bloomFilter`` applies, here as
    an explicit operator so the reduction also works across separately
    materialized stages and with the repo's mergeable
    :func:`~walker_spark.operators.sketches.bloom_bits` tables).

    Shape: the build side's join keys hash into a plain-row bit table
    (at most ``m_bits`` rows regardless of build size); the probe side
    is then reduced MAP-SIDE by ``k`` chained broadcast LEFT-SEMI
    joins — one per hash position, zero exchange on the probe side —
    before the real equi-join sees it. At scale this is the difference
    between shuffling the full probe table and shuffling only the
    rows that can possibly match: Bloom false positives pass the
    pre-filter but are dropped by the final equi-join, and there are
    no false negatives, so the result is EXACTLY the plain join (the
    oracle runs the plain join).

    ``bits=`` accepts a precomputed/persisted ``bloom_bits`` table
    over the SAME key expression (the pairs=/edges= reuse pattern) so
    a daily-increment pipeline can probe yesterday's sketch without
    touching the build table. ``how`` is ``inner`` or ``left_semi`` —
    outer joins would need the filtered-out probe rows back and are
    not what a Bloom reduction is for.

    Reference parity note: walker's seen-set check (urlseen) is the
    crawl-specific instance of this shape; this is the generic join
    operator over any key.
    """
    from .sketches import _md5_u32, bloom_bits

    if how not in ("inner", "left_semi"):
        raise ValueError("bloom_filtered_join supports inner/left_semi only")
    keys = [on] if isinstance(on, str) else list(on)
    # Null-propagating composite key (concat, NOT concat_ws): a null
    # in any key column can never equi-match, and its null hash
    # position fails the semi-join, so the pre-filter drops exactly
    # the rows the join would drop.
    def _key(df: DataFrame) -> F.Column:
        cols = [df[c].cast("string") for c in keys]
        if len(cols) == 1:
            return cols[0]
        sep = F.lit("\x1f")
        parts: list = []
        for i, c in enumerate(cols):
            if i:
                parts.append(sep)
            parts.append(c)
        return F.concat(*parts)

    if bits is None:
        bits = bloom_bits(
            build.select(_key(build).alias("_bloom_key")),
            "_bloom_key",
            m_bits=m_bits,
            k=k,
        )
    pkey = _key(probe)
    filtered = probe
    for j in range(k):
        bj = bits.select(F.col("bit").alias(f"_bloom_bit_{j}"))
        pos = _md5_u32(F.concat(pkey, F.lit(f":{j}"))) % m_bits
        filtered = filtered.join(
            F.broadcast(bj), pos == F.col(f"_bloom_bit_{j}"), "left_semi"
        )
    return filtered.join(build, keys, how)
