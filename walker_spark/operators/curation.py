"""Corpus-curation operators for training-data pipelines: the
selection/mixing/packing steps that sit between raw crawl output and a
tokenizer at 100 TB. All DataFrame-native, all deterministic (no RNG
state — every decision derives from md5/content, so retried tasks,
repartitioned runs and resumed jobs pick identical rows), and all
expressible in ANSI SQL for cross-engine oracle checks.

Beyond-the-reference scope (the crawler only *collects*; these curate):
deterministic sampling, per-source mix capping, token-budget sequence
packing, and benchmark decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _unit_uniform(col) -> "F.Column":
    """Deterministic U[0,1) from a value: first 8 hex digits of
    md5(value) / 2^32. Stable across engines, partitionings, retries —
    the reproducible-sampling primitive a 100 TB pipeline needs instead
    of RNG state."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate of rows, chosen by a content-derived hash rather than
    an RNG: (id). Rerunning at any parallelism yields the same set, and
    the same row is kept/dropped consistently across pipeline stages
    (unlike df.sample, whose outcome depends on partitioning)."""
    return (
        df.select(F.col(id_col).alias("id"), _unit_uniform(F.col(id_col)).alias("_u"))
        .filter(F.col("_u") < rate)
        .select("id")
    )


def cap_per_source(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Data-mix balancing: at most ``k`` docs per source, keeping the
    smallest ids (deterministic): (id, source, rk). One shuffle on
    source; at 10^10 docs the window partitions by the mix key exactly
    as the dispatcher partitions by dom."""
    w = Window.partitionBy(source_col).orderBy(id_col)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col(id_col).alias("id"), F.col(source_col).alias("source"), "rk"
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Sequence packing for training: assign each doc to a pack of
    ~``budget_tokens`` whitespace tokens, filling packs in doc-id order
    within each source shard: (id, source, n_tokens, pack_id).

    pack_id = floor(cumulative-tokens-before-this-doc / budget): packs
    are contiguous runs and the doc that crosses a boundary overflows
    its pack (standard best-effort packing; overflow is truncated
    downstream). Pure window arithmetic — one shuffle on the shard key,
    no Python, and the same SQL runs on any engine."""
    t = F.col(text_col)
    n_tokens = (
        F.when(F.length(F.trim(t)) == 0, 0)
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
    )
    w = Window.partitionBy(source_col).orderBy(id_col)
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("pack_id", F.floor(cum_before / F.lit(budget_tokens)).cast("long"))
        .select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            "n_tokens",
            "pack_id",
        )
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: ids of corpus docs sharing at least
    one word ``ngram``-gram with any benchmark doc: (id). The benchmark
    side (eval sets are tiny relative to the corpus) is broadcast by
    default, so the corpus is filtered map-side with no shuffle of
    corpus n-grams."""
    from walker_spark.operators.dedup import _shingles

    grams = _shingles(corpus, id_col, text_col, ngram)
    bench_grams = _shingles(benchmark, id_col, text_col, ngram).select(
        "shingle"
    ).dropDuplicates()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        grams.join(bench_grams, "shingle", "left_semi")
        .select(F.col("_id").alias("id"))
        .dropDuplicates()
    )
