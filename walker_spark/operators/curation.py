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


def temperature_mix(
    df: DataFrame,
    budget_docs: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based data-mix sampling (the GPT-3 / LLaMA mixture
    rule): sample each source with probability proportional to
    ``n_source ** alpha`` so head domains are down-weighted and tail
    domains up-weighted, targeting ~``budget_docs`` kept rows total.

    Per source s with n_s docs: weight w_s = n_s^alpha / sum_t n_t^alpha,
    keep probability p_s = min(1, budget * w_s / n_s). Membership uses
    the same deterministic md5 uniform as :func:`deterministic_sample`,
    so retries/repartitions keep identical rows and the whole decision
    is ANSI-SQL replayable: (id, source).

    Scale shape: the per-source count is one map-side-combined groupBy
    on the mix key (output rows = #sources, i.e. tiny), the weight
    normalizer rides it as a one-row cross join, and the probability
    table broadcasts back onto the corpus — the 100 TB scan is filtered
    map-side with no corpus shuffle."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    z = counts.agg(F.sum(F.pow(F.col("_n").cast("double"), alpha)).alias("_z"))
    probs = counts.crossJoin(F.broadcast(z)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget_docs))
            * F.pow(F.col("_n").cast("double"), alpha)
            / F.col("_z")
            / F.col("_n").cast("double"),
        ).alias("_p"),
    )
    return (
        df.join(F.broadcast(probs), source_col)
        .filter(_unit_uniform(F.col(id_col)) < F.col("_p"))
        .select(F.col(id_col).alias("id"), F.col(source_col).alias("source"))
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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (the RAG-indexing / context-
    window-packing primitive): split each document into overlapping
    windows of ``chunk_tokens`` whitespace tokens with ``overlap``
    tokens of context carried between consecutive chunks (stride =
    chunk_tokens - overlap). Tail chunks shorter than ``min_tokens``
    are dropped unless they are the document's only chunk.

    Returns (id, chunk_idx, chunk_id, n_chunk_tokens, chunk_text) with
    chunk_id = md5("id:idx") — a stable key for downstream embedding /
    indexing stages. Pure narrow fan-out: ``sequence`` over the window
    starts + ``posexplode`` + ``slice``, zero shuffle, so the row
    multiplication happens inside the scan task that read the document
    and never moves whole-document text across the cluster."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    from walker_spark.operators.dedup import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t")).filter(
        F.size("_t") > 0
    )
    starts = F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
    out = base.select(
        "id",
        "_t",
        F.posexplode(starts).alias("chunk_idx", "_start"),
    ).select(
        "id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5(
            F.concat(F.col("id").cast("string"), F.lit(":"), F.col("chunk_idx").cast("string"))
        ).alias("chunk_id"),
        F.slice("_t", F.col("_start") + 1, F.lit(chunk_tokens)).alias("_c"),
    )
    return out.filter(
        (F.size("_c") >= min_tokens) | (F.col("chunk_idx") == 0)
    ).select(
        "id",
        "chunk_idx",
        "chunk_id",
        F.size("_c").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("_c")).alias("chunk_text"),
    )


def assign_shards(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Global training-shard assignment: every document gets a shard id
    so that shards are contiguous runs of ~``shard_tokens`` whitespace
    tokens in global ``id_col`` order — the step that turns a curated
    corpus into fixed-size training shards for a data loader. Returns
    ``(id, n_tokens, shard_id)`` with
    ``shard_id = cumulative-tokens-before-this-doc div shard_tokens``
    (the boundary-crossing doc overflows its shard, same best-effort
    policy as :func:`pack_sequences`).

    Unlike :func:`pack_sequences` (one window per ``source`` shard —
    correct when sources bound the partition size) this is a GLOBAL
    prefix sum with no single-reducer window: the weighted twin of
    :func:`walker_spark.operators.textstats.perplexity_buckets`'s rank
    machinery. ``repartitionByRange(id)`` (localCheckpointed once —
    the per-partition totals and the local cumulative sums must see
    the same sampled partition assignment), per-partition token totals
    collapse to a <=P-row broadcast offset table, and the local
    cumulative window is keyed on the partition id. Integer arithmetic
    throughout, so the SQL oracle replays it exactly."""
    t = F.col(text_col)
    n_tokens = (
        F.when(F.length(F.trim(t)) == 0, 0)
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
    )
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.select(F.col(id_col).alias("id"), n_tokens.alias("n_tokens"))
        .repartitionByRange(p, F.col("id").asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
        )
    )
    w_pid = Window.partitionBy("_pid").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        ranged.withColumn(
            "_local", F.coalesce(F.sum("n_tokens").over(w_pid), F.lit(0))
        )
        .join(F.broadcast(offsets), "_pid")
        .select(
            "id",
            "n_tokens",
            F.expr(f"(_off + _local) div {int(shard_tokens)}").alias("shard_id"),
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


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Sequence-level decontamination: the exact contaminated token
    SPANS per corpus doc, so the pipeline can cut the leaked benchmark
    text and KEEP the rest of the document (``contaminated_docs`` drops
    whole documents — wasteful when one boilerplate line leaks).

    Marks every corpus position whose word ``ngram``-gram appears in
    the benchmark, then merges overlapping ``[pos, pos+ngram)`` windows
    per doc (the :func:`walker_spark.operators.dedup.dup_ngram_spans`
    island merge, shared code). The benchmark gram-key set is broadcast
    (eval sets are tiny next to the corpus), so corpus grams are
    filtered map-side — the only exchange is the per-doc island-merge
    window. Returns ``(doc_id, span_start, span_end, span_tokens)``,
    span_end exclusive, BIGINT.
    """
    from walker_spark.operators.dedup import merge_islands, positional_ngrams

    grams = positional_ngrams(corpus, id_col, text_col, ngram)
    bench_keys = (
        positional_ngrams(benchmark, id_col, text_col, ngram)
        .select("gram_key")
        .dropDuplicates()
    )
    if broadcast_benchmark:
        bench_keys = F.broadcast(bench_keys)
    hits = grams.join(bench_keys, "gram_key", "left_semi").select("_id", "pos")
    return merge_islands(hits, ngram, id_col)


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply span-level cuts: remove the tokens covered by ``spans``
    (``(id_col, span_start, span_end)`` — e.g. from
    :func:`contamination_spans`) from each document's whitespace
    tokenization and re-join the survivors: ``(id_col, text,
    removed_tokens)``. Docs with no spans pass through with their
    normalized token stream intact (``removed_tokens = 0``).

    JVM-only: spans are grouped to one array per doc (bounded by doc
    length), joined left, and the cut is a higher-order ``filter`` with
    the token index tested against the span array — no Python, no
    per-token shuffle; the only exchange is the span groupBy."""
    from walker_spark.operators.dedup import tokens

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = tokens(F.col(text_col))
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    kept = F.filter(toks, lambda t, i: ~F.coalesce(covered(i), F.lit(False)))
    return (
        df.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.concat_ws(" ", kept).alias("text"),
            F.when(F.col("_spans").isNull(), F.lit(0))
            .otherwise(F.size(toks) - F.size(kept))
            .cast("long")
            .alias("removed_tokens"),
        )
    )


def _hashed_bigrams(df: DataFrame, buckets: int, id_col: str, text_col: str) -> DataFrame:
    """(_id, bucket): one row per token-bigram position, hashed into
    ``buckets`` via the first 8 hex digits of md5 (cross-engine
    replayable, unlike xxhash64). The DSIR feature space."""
    from walker_spark.operators.dedup import tokens

    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("gram"))
        .filter(F.length("gram") > 0)
        .select(
            "_id",
            F.pmod(
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"),
                F.lit(buckets),
            ).cast("int")
            .alias("bucket"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): pick the ``k`` raw documents whose hashed-bigram profile
    looks most like the ``target`` corpus, via Gumbel top-k over
    importance weights — the standard pretraining-data selection step
    when a small high-quality target set defines "what good looks
    like".

    Per bucket b, Laplace-smoothed log-probabilities under the target
    (p) and raw (q) bag-of-bigrams models; per raw doc, log importance
    weight = sum over its bigram positions of (log p_b - log q_b);
    selection key = round(log w + Gumbel(md5(id)), 3) — the Gumbel
    noise is deterministic (md5-uniform, shifted off 0 so ln never
    sees it), so the sample is reproducible across retries and
    replayable in ANSI SQL. Returns (id, dsir_score) — the top ``k``
    by (key desc, id).

    Scale shape: each gram stream is exploded and hashed exactly ONCE —
    the target side collapses straight to its ≤``buckets``-row count
    table and the raw side to per-(doc, bucket) counts (map-side
    partial agg; bounded by docs × buckets, far smaller than the gram
    stream). Both aggregates are localCheckpointed so the count /
    total / log-ratio / scoring branches all derive from the
    materialized tables instead of re-running the explode per branch
    (at production scale these are the tables you would persist). The
    log-ratio table broadcasts onto the per-doc counts, so the only
    corpus-sized exchanges are the two bounded aggregations. Docs with
    no bigram (one token or empty) have no profile and are never
    selected — documented DSIR behavior, not a bug."""
    tg = _hashed_bigrams(target, buckets, id_col, text_col)
    rg = _hashed_bigrams(raw, buckets, id_col, text_col)
    tc = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc")).localCheckpoint()
    gdoc = (
        rg.groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    rc = gdoc.groupBy("bucket").agg(F.sum("n").alias("rc"))
    tot = tc.agg(F.sum("tc").alias("T")).crossJoin(
        rc.agg(F.sum("rc").alias("R"))
    )
    lr = (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (
                    F.log(F.coalesce(F.col("tc"), F.lit(0)).cast("double") + 1.0)
                    - F.log(F.col("T").cast("double") + float(buckets))
                )
                - (
                    F.log(F.coalesce(F.col("rc"), F.lit(0)).cast("double") + 1.0)
                    - F.log(F.col("R").cast("double") + float(buckets))
                )
            ).alias("lr"),
        )
    )
    logw = gdoc.join(F.broadcast(lr), "bucket").groupBy("_id").agg(
        F.sum(F.col("n") * F.col("lr")).alias("logw")
    )
    # Gumbel(0,1) from the deterministic md5 uniform, shifted to (0,1)
    # exclusive so neither ln can see 0 (ANSI-safe)
    u = (
        F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(float(1 << 32))
    key = F.round(F.col("logw") - F.log(-F.log(u)), 3)
    return (
        logw.select(F.col("_id").alias("id"), key.alias("dsir_score"))
        .orderBy(F.col("dsir_score").desc(), F.col("id"))
        .limit(k)
    )


def _grouped_hash_rank(
    df: DataFrame,
    group_col: str,
    id_col: str,
    salt: str,
    partitions: int | None = None,
) -> DataFrame:
    """The GROUPED distributed exact rank (perplexity_buckets'
    checkpoint-once machinery, shared by :func:`stratified_split` and
    :func:`matched_sample`): rows rank 1..n within their group by
    ``(md5(salt || id), id)`` — deterministic across runs,
    partitionings and engines. Returns ``(_g, _id, _rank, _n)``.

    Shape: ``repartitionByRange`` on (group, hash, id)
    localCheckpointed ONCE (the offsets branch and the rank branch
    must share the sampled partition assignment — lazy re-eval of
    repartitionByRange is not replay-safe), per-partition row_number
    keyed on (partition id, group), broadcast P×G offset table whose
    per-group prefix sums run in pid order. Two exchanges total, no
    per-group global sort, no hot window partition."""
    from pyspark.sql import Window

    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(id_col).alias("_id"),
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("_h"),
        )
        .repartitionByRange(p, "_g", "_h", "_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_all = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = (
        Window.partitionBy("_g")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy("_pid", "_g")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            "_g",
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(w_all).alias("_n"),
        )
    )
    w_pid = Window.partitionBy("_pid", "_g").orderBy("_h", "_id")
    return (
        ranged.withColumn("_rn", F.row_number().over(w_pid))
        .join(F.broadcast(offsets), ["_pid", "_g"])
        .withColumn("_rank", (F.col("_off") + F.col("_rn")).cast("long"))
    )


def matched_sample(
    df: DataFrame,
    target: DataFrame,
    bucket_col: str = "bucket",
    n_total: int = 1000,
    id_col: str = "doc_id",
    salt: str = "match",
) -> DataFrame:
    """Distribution-matched sampling: draw ~``n_total`` rows from
    ``df`` whose ``bucket_col`` histogram MATCHES the ``target``
    frame's bucket distribution — the controlled-comparison sampler
    (ablations, eval-set construction, DSIR-style raw-vs-target
    studies) where a plain uniform sample would inherit the corpus's
    own skew. Per-bucket quota is the exact integer

        quota_b = floor(n_total * t_b div T)   (t_b target counts)

    capped by availability; within a bucket the kept rows are the
    ``(md5(salt || id), id)``-smallest — deterministic across runs,
    partitionings and engines. Returns ``(id_col, bucket_col, rank,
    quota, avail)`` for kept rows only; buckets absent from the
    target draw nothing (quota 0), buckets absent from the corpus
    contribute nothing (documented shortfall — no reallocation, so
    the output histogram is exactly min(quota, avail) per bucket).

    Scale shape: the target side collapses to a bucket-count table
    (broadcast); ranking is the shared :func:`_grouped_hash_rank`
    checkpoint-once machinery — two corpus exchanges, no hot window
    partition for a mega-bucket."""
    if n_total < 1:
        raise ValueError(f"n_total must be >= 1: {n_total}")
    tcounts = target.groupBy(F.col(bucket_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("_tcnt")
    )
    # window total instead of a crossJoin back onto the (shared-
    # lineage) aggregate — one tiny bucket-count table, single pass
    from pyspark.sql import Window

    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quotas = tcounts.select(
        "_g",
        "_tcnt",
        F.sum("_tcnt").over(w_all).alias("_ttot"),
    ).select(
        "_g",
        F.expr(f"CAST({int(n_total)} * _tcnt div _ttot AS BIGINT)").alias(
            "_quota"
        ),
    )
    ranked = _grouped_hash_rank(df, bucket_col, id_col, salt)
    return (
        ranked.join(F.broadcast(quotas), "_g")
        .filter(F.col("_rank") <= F.col("_quota"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(bucket_col),
            F.col("_rank").alias("rank"),
            F.col("_quota").alias("quota"),
            F.col("_n").cast("long").alias("avail"),
        )
    )


def stratified_split(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (("test", 0.1), ("val", 0.1)),
    salt: str = "split",
    train_name: str = "train",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic EXACT-quota train/val/test split per stratum —
    the held-out-set carve a hash-threshold sample
    (:func:`deterministic_sample`) can't give: every stratum
    contributes exactly ``floor(f * n)`` rows to each named split
    (ranks 1..t1 -> first split, t1+1..t2 -> second, rest ->
    ``train_name``), reproducible across runs, partitionings and
    engines because rank order is (md5(salt||id), id).

    Returns ``(id_col, strata_col, split, rank, n)`` with ``rank`` the
    1-based position in the stratum's hash order and ``n`` the stratum
    size.

    Scale shape: the perplexity_buckets distributed-rank machinery
    GROUPED — ``repartitionByRange`` on (stratum, hash, id)
    (localCheckpointed ONCE; the offsets branch and the rank branch
    must share the sampled partition assignment), per-partition
    ``row_number`` keyed on (partition id, stratum), and a broadcast
    P×S offset table whose per-stratum prefix sums run in pid order.
    Two corpus exchanges total (the range partition inside the
    checkpoint job, then the slim (partition-id, stratum) re-key the
    rank window requires), no per-stratum global sort, no hot window
    partition (the biggest window is one partition's slice of one
    stratum). Quota thresholds are ``floor(literal * n)`` — the same
    float-product-of-driver-literals pattern as exact_percentiles, so
    the cut is cross-engine exact.
    """
    ranked = _grouped_hash_rank(df, strata_col, id_col, salt, partitions)
    cum = F.lit(0).cast("long")
    chain = None
    for name, frac in fractions:
        cum = cum + F.floor(F.lit(float(frac)) * F.col("_n")).cast("long")
        cond = F.col("_rank") <= cum
        chain = F.when(cond, name) if chain is None else chain.when(cond, name)
    split = chain.otherwise(train_name) if chain is not None else F.lit(train_name)
    return ranked.select(
        F.col("_id").alias(id_col),
        F.col("_g").alias(strata_col),
        split.alias("split"),
        F.col("_rank").alias("rank"),
        F.col("_n").cast("long").alias("n"),
    )


def unimax_allocation(
    df: DataFrame,
    budget: int,
    max_epochs: int = 2,
    source_col: str = "source",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, ICLR — Algorithm 1
    closed form): spread a total document budget as uniformly as
    possible across sources, capping every source at ``max_epochs``
    passes over its data. Sources sorted ascending by capacity
    ``cap = max_epochs * n``; the largest prefix whose capacities fit
    under an equal-share waterline is fully capped, the remainder
    splits the leftover budget evenly (floor + first-``rem`` +1 in sort
    order — pure integer math, so allocations are exact and sum to
    ``min(budget, total capacity)``; the +1 remainder spread and the
    (capacity, source) tie-break make the result deterministic).

    Returns ``(source, n_docs, capacity, alloc, share_ppm)`` with
    ``share_ppm = alloc * 1e6 div budget``.

    Scale shape: ONE map-side-combined groupBy on the source key; the
    waterfilling windows then run on the aggregated table whose row
    count is the number of SOURCES (languages/domains — thousands at
    most), so the global windows are driver-trivial by construction
    (same tiny-table contract as temperature_mix's normalizer).
    """
    from pyspark.sql import Window

    b = F.lit(int(budget)).cast("long")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_ord = Window.orderBy("capacity", "source")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = (
        counts.withColumn(
            "capacity", (F.col("n_docs") * F.lit(int(max_epochs))).cast("long")
        )
        .withColumn("_idx", F.row_number().over(w_ord).cast("long"))
        .withColumn("_prefix", F.sum("capacity").over(w_cum))
        .withColumn("_s", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_capped",
            F.col("capacity") * (F.col("_s") - F.col("_idx") + 1)
            + (F.col("_prefix") - F.col("capacity"))
            <= b,
        )
        .withColumn(
            "_kstar",
            F.max(F.when(F.col("_capped"), F.col("_idx")).otherwise(0)).over(w_all),
        )
        .withColumn(
            "_prefix_k",
            F.max(F.when(F.col("_capped"), F.col("_prefix")).otherwise(0)).over(w_all),
        )
        .withColumn("_r", b - F.col("_prefix_k"))
        .withColumn("_u", F.col("_s") - F.col("_kstar"))
        .withColumn("_base", F.expr("CASE WHEN _u > 0 THEN _r div _u ELSE 0 END"))
        .withColumn("_rem", F.expr("CASE WHEN _u > 0 THEN _r % _u ELSE 0 END"))
    )
    alloc = F.when(F.col("_capped"), F.col("capacity")).otherwise(
        F.col("_base")
        + F.when(F.col("_idx") - F.col("_kstar") <= F.col("_rem"), 1).otherwise(0)
    )
    return t.select(
        "source",
        "n_docs",
        "capacity",
        alloc.cast("long").alias("alloc"),
    ).withColumn(
        "share_ppm",
        F.expr(f"(alloc * 1000000L) div CAST({int(budget)} AS BIGINT)"),
    )


def unimax_mix(
    df: DataFrame,
    budget: int,
    max_epochs: int = 2,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Apply a :func:`unimax_allocation` to the corpus: every document
    gets ``n_repeats = alloc div n`` full epochs plus one more with
    probability ``(alloc mod n) / n`` — decided by the deterministic
    md5 uniform (u32 in [0, 2^32)) against a per-source integer
    threshold, so membership is exact, replayable, and identical
    across engines/retries/partitionings. Returns
    ``(id, source, n_repeats)`` with ``n_repeats >= 1`` rows only
    (the training mixture; repeat expansion is the loader's job).

    Scale shape: the allocation table (rows = #sources) broadcasts
    back onto the corpus — the 100 TB scan is filtered map-side with
    no corpus shuffle. The fractional-epoch threshold is computed once
    per source in DECIMAL(38,0) (``(alloc mod n) * 2^32 div n``), so
    nothing overflows even at 10^10 docs/source, and the per-doc test
    is a single long comparison.
    """
    probs = unimax_allocation(df, budget, max_epochs, source_col).select(
        "source",
        F.expr("alloc div n_docs").cast("long").alias("_e"),
        F.expr(
            "CAST(CAST(CAST(alloc % n_docs AS DECIMAL(38,0)) * 4294967296 "
            "AS DECIMAL(38,0)) div CAST(n_docs AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("_thr"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            u32.alias("_u32"),
        )
        .join(F.broadcast(probs), "source")
        .withColumn(
            "n_repeats",
            (F.col("_e") + (F.col("_u32") < F.col("_thr")).cast("long")).cast("long"),
        )
        .filter(F.col("n_repeats") >= 1)
        .select("id", "source", "n_repeats")
    )


def prepare_training_data(
    docs: DataFrame,
    benchmark: DataFrame,
    budget_docs: int,
    shard_tokens: int = 2048,
    alpha: float = 0.5,
    decontam_ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    quality: dict | None = None,
) -> DataFrame:
    """END-TO-END corpus curation — the FineWeb/RefinedWeb pipeline
    shape as one composed plan: quality gate (fused C4 -> Gopher ->
    classifier verdict) -> exact dedup (min id per 128-bit content
    key) -> benchmark decontamination (n-gram leak anti-join) ->
    temperature mixture (n^alpha source reweighting to ~budget docs)
    -> global shard assignment (~``shard_tokens`` tokens per shard in
    id order). Returns ``(id, source, n_tokens, shard_id)`` — the
    loader-ready corpus manifest.

    Every stage is an existing oracle-checked operator; this function
    is the composition, and the whole chain stays one lazy plan (no
    materialization barriers besides assign_shards' checkpoint-once
    range partition). Scale shape inherits from the stages: the
    quality verdict is a zero-exchange projection, dedup is one
    content-key exchange, the benchmark side broadcasts, the mixture
    threshold table broadcasts, and the shard prefix sum is the
    distributed-rank machinery — corpus text is only ever exchanged by
    the dedup groupBy's 32-byte keys and the final range partition.
    """
    from walker_spark.operators.dedup import exact_dedup
    from walker_spark.operators.textstats import quality_pipeline

    verdict = quality_pipeline(
        docs, id_col=id_col, text_col=text_col, **(quality or {})
    )
    passed = docs.join(
        verdict.filter(F.col("quality_pass")).select(F.col("id").alias(id_col)),
        id_col,
        "left_semi",
    )
    keepers = exact_dedup(passed, id_col, text_col)
    survivors = passed.join(keepers, id_col, "left_semi")
    bad = contaminated_docs(
        survivors, benchmark, ngram=decontam_ngram, id_col=id_col, text_col=text_col
    )
    clean = survivors.join(
        bad.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    mixed = temperature_mix(clean, budget_docs, alpha, id_col, source_col)
    final = clean.join(
        mixed.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    shards = assign_shards(final, shard_tokens, id_col, text_col)
    src = final.select(F.col(id_col).alias("id"), F.col(source_col).alias("source"))
    return shards.join(src, "id").select("id", "source", "n_tokens", "shard_id")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_cols: "Sequence[str]" = (),
    id_col: str = "doc_id",
    salt_shards: int = 64,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis-Spirakis A-ES scheme (Efraimidis & Spirakis 2006):
    every row gets key ``u^(1/w)`` (here its log form ``ln(u)/w``)
    and the k largest keys are a weight-proportional sample. The
    uniform is the deterministic md5 of the row id, shifted off zero
    so ANSI ``ln`` never sees 0 (the dsir_select precedent), and the
    key is rounded to 6 decimals BEFORE ranking with an id tie-break
    — what makes the k-th boundary reproducible across engines,
    partitionings and retries (no RNG state, the 100 TB sampling
    contract).

    Rows with non-positive weight are excluded (they have zero
    selection probability in A-ES). Top-k is the TWO-LEVEL salted
    window (kmv_sketch precedent): first within (group, salt-of-id)
    so no task ranks a whole mega-group, then over the <=
    ``salt_shards * k`` survivors. Returns ``(group..., id, weight,
    es_key, rn)``."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    gcols = list(group_cols)
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(float(1 << 32))
    base = df.filter(w > 0).select(
        *gcols,
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("weight"),
        F.round(F.log(u) / w, 6).alias("es_key"),
    )
    salt = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 10)
        % F.lit(salt_shards)
    ).alias("_salt")
    w1 = Window.partitionBy(*gcols, "_salt").orderBy(
        F.desc("es_key"), F.asc("id")
    )
    w2 = Window.partitionBy(*gcols).orderBy(F.desc("es_key"), F.asc("id"))
    return (
        base.select("*", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= k)
        .select(*gcols, "id", "weight", "es_key", "rn")
    )


def corpus_report(
    docs: DataFrame,
    verdicts: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Dataset-card rollup — the per-source summary every released
    training corpus ships (the "data card" tables in the Pile / C4 /
    FineWeb papers): ``(source, n_docs, n_tokens, n_exact_dup_docs,
    n_quality_pass)``, all exact BIGINT (the driver-hash rule: never a
    float in a report column). ``n_tokens`` is the whitespace law
    shared with ``textstats.token_stats``; ``n_exact_dup_docs`` counts
    docs whose md5 content key occurs more than once CORPUS-wide
    (cross-source duplicates count for every source holding a copy);
    ``n_quality_pass`` sums the fused-pipeline verdict.

    ``verdicts`` defaults to ``textstats.quality_pipeline(docs)`` —
    pass the frame you actually gated with so the card reports the
    real pipeline's thresholds.

    Scale shape: content-key counts are a two-phase agg on the 32-byte
    md5 key joined back on that same key (text never shuffles — the
    key and token count ride the projection); the verdict join is
    id-keyed; the final rollup is source-keyed with map-side partials
    onto a source-cardinality result. Three exchanges total,
    each carrying narrow rows."""
    if verdicts is None:
        from walker_spark.operators.textstats import quality_pipeline

        verdicts = quality_pipeline(docs, id_col=id_col, text_col=text_col)
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.md5(t.cast("string")).alias("_ck"),
        F.when(F.length(F.trim(t)) == 0, 0)
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
        .alias("_nt"),
    )
    ck_counts = base.groupBy("_ck").agg(F.count(F.lit(1)).alias("_ckn"))
    keyed = base.join(ck_counts, "_ck")
    v = verdicts.select(
        F.col("id"), F.col("quality_pass").cast("long").alias("_qp")
    )
    return (
        keyed.join(v, "id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum((F.col("_ckn") > 1).cast("long"))
            .cast("long")
            .alias("n_exact_dup_docs"),
            F.sum(F.coalesce(F.col("_qp"), F.lit(0)))
            .cast("long")
            .alias("n_quality_pass"),
        )
    )


def grouped_split(
    df: DataFrame,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    id_col: str = "doc_id",
    group_col: str = "source",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every document in a
    GROUP (host, source, dup cluster id) lands in the same split, so
    the near-duplicates and templated pages that cluster within a host
    can never straddle the train/eval boundary — the standard guard
    against intra-site leakage that a row-level random split silently
    violates (the reason eval suites decontaminate by URL host).

    Deterministic and engine-replayable: the group's md5-u32 (salted
    so it decorrelates from every other md5(group) decision in the
    pipeline) is compared against EXACT integer thresholds
    ``floor(cum_fraction * 2^32)`` precomputed on the driver — no
    float ever touches the decision, and rerunning at any parallelism
    or engine reproduces the identical assignment.

    Scale shape: a pure zero-shuffle projection over the corpus scan
    (the CASE chain is whole-stage-codegen'd); group cardinality never
    matters because the group key is hashed in place, not aggregated.
    Output: ``(id, group, split)``.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cum, thresholds = 0.0, []
    for name, frac in fractions[:-1]:
        cum += frac
        thresholds.append((name, min(1 << 32, int(cum * (1 << 32)))))
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(group_col))), 1, 8),
        16,
        10,
    ).cast("long")
    split = F.lit(fractions[-1][0])
    for name, thr in reversed(thresholds):
        split = F.when(u32 < F.lit(thr), F.lit(name)).otherwise(split)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        split.alias("split"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    thresholds,
    weight_col: str | None = None,
) -> DataFrame:
    """Survival curve for a quality-filter threshold decision: one
    row per candidate threshold ``(step, threshold, docs, weight,
    docs_ppm, weight_ppm)`` — how many documents (and how much
    token/byte weight) survive ``score >= t``, with exact-integer ppm
    shares of the full corpus. The curve is what a curator actually
    looks at before picking a cutoff (quality-vs-quantity pareto);
    computing it per-threshold would rescan the corpus K times.

    ONE corpus pass: each row maps to the COUNT of (ascending)
    thresholds it passes — ``score >= t_i`` is monotone in i, so
    "passes t_i" ⟺ "count >= i" — then a (K+1)-bucket histogram rolls
    up with the funnel_counts suffix-sum shape. Everything after the
    bucket aggregation is K-row metadata; ``weight_col`` (token
    counts, bytes) defaults to 1 per doc."""
    spark = df.sparkSession
    ths = sorted(thresholds)
    if not ths:
        raise ValueError("threshold_sweep needs at least one threshold")
    arr = F.array(*[F.lit(t) for t in ths])
    w = F.col(weight_col) if weight_col else F.lit(1)
    score = F.col(score_col)
    buckets = (
        df.select(
            F.size(F.filter(arr, lambda t: score >= t)).alias("_idx"),
            w.cast("long").alias("_w"),
        )
        .groupBy("_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_docs"),
            F.sum("_w").cast("long").alias("_weight"),
        )
    )
    totals = buckets.agg(
        F.sum("_docs").cast("long").alias("_td"),
        F.sum("_weight").cast("long").alias("_tw"),
    )
    steps = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(ths)], ["step", "threshold"]
    )
    reached = (
        steps.join(buckets, F.col("_idx") >= F.col("step"), "left")
        .groupBy("step", "threshold")
        .agg(
            F.coalesce(F.sum("_docs"), F.lit(0)).cast("long").alias("docs"),
            F.coalesce(F.sum("_weight"), F.lit(0))
            .cast("long")
            .alias("weight"),
        )
    )
    return reached.crossJoin(F.broadcast(totals)).select(
        F.col("step").cast("long").alias("step"),
        "threshold",
        "docs",
        "weight",
        F.expr(
            "CASE WHEN _td > 0 THEN (docs * 1000000) div _td "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("docs_ppm"),
        F.expr(
            "CASE WHEN _tw > 0 THEN (weight * 1000000) div _tw "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("weight_ppm"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level benchmark decontamination — the fuzzy
    complement of :func:`contaminated_docs`' exact n-gram matching
    (the "semantic leakage" check training reports run next to string
    decontamination): flag corpus items whose nearest BENCHMARK
    embedding has cosine >= threshold.

    Scale shape — the corpus path is ZERO-exchange: the IVF codebook
    is learned from the BENCH side (first-n deterministic sample —
    bench sets are small, the codebook is KB driver state); bench
    items group per cell into arrays and BROADCAST; each corpus row
    computes its own cell with the same argmin projection and folds
    the cosines of that cell's bench items in place (array_max over a
    (cosine, bench_id) struct array — ties to the larger bench id).
    Cost is N x B/C instead of N x B; cross-cell near-matches are
    missed — the SemDeDup blocking approximation, documented.

    Output ``(id, bench_id, cosine, contaminated)``: cosine ROUNDED
    to 3 before thresholding and ranking (the knn_graph cross-engine
    rule); corpus items whose cell holds no bench item report
    (-1, -1.0, 0)."""
    from .similarity import (
        _dot,
        _norm,
        _sq_l2,
        ivf_sample_centroids,
    )

    centroids = ivf_sample_centroids(bench, n_centroids, id_col, vec_col)

    def assign(vcol):
        dists = F.array(*[_sq_l2(vcol, c) for c in centroids])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast(
            "int"
        )

    bcells = (
        bench.select(
            F.col(id_col).alias("bid"),
            F.col(vec_col).cast("array<double>").alias("bv"),
        )
        .withColumn("cid", assign(F.col("bv")))
        .withColumn("bn", _norm(F.col("bv")))
        .groupBy("cid")
        .agg(
            F.collect_list(F.struct("bv", "bn", "bid")).alias("_items")
        )
    )
    cv = F.col("_cv")
    scored = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        .withColumn("cid", assign(cv))
        .withColumn("_cn", _norm(cv))
        .join(F.broadcast(bcells), "cid", "left")
        .withColumn(
            "_best",
            F.array_max(
                F.transform(
                    F.col("_items"),
                    lambda x: F.struct(
                        F.round(
                            F.try_divide(
                                _dot(cv, x["bv"]), F.col("_cn") * x["bn"]
                            ),
                            3,
                        ).alias("c"),
                        x["bid"].alias("b"),
                    ),
                )
            ),
        )
    )
    return scored.select(
        "id",
        F.coalesce(F.col("_best.b"), F.lit(-1)).cast("long").alias(
            "bench_id"
        ),
        F.coalesce(F.col("_best.c"), F.lit(-1.0)).alias("cosine"),
        (
            F.coalesce(F.col("_best.c"), F.lit(-1.0)) >= F.lit(threshold)
        )
        .cast("long")
        .alias("contaminated"),
    )


def k_anonymity_classes(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over quasi-identifier
    columns — the structured-privacy complement to
    ``textstats.redact_pii``'s free-text pass: rows whose
    quasi-identifier combination (the equivalence class) is shared by
    fewer than ``k`` rows are re-identifiable by linkage. Returns one
    row per equivalence class: ``(qi..., class_n, at_risk)`` with
    ``at_risk = class_n < k`` — release gates drop or generalize the
    risky classes before data leaves the pipeline.

    Scale shape: ONE two-phase hash agg on the QI key (map-side
    partials collapse each task's classes before the exchange);
    output is bounded by the QI domain product, not row count."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    if not qi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_n")
    ).select(*qi_cols, "class_n", (F.col("class_n") < k).alias("at_risk"))


def k_anonymity_report(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row rollup of :func:`k_anonymity_classes`: ``(n_rows,
    n_classes, risky_classes, risky_rows, risky_ppm)`` — the release
    scorecard (``risky_ppm = risky_rows * 1e6 div n_rows``, exact
    integer; 0-row input reports zeros)."""
    classes = k_anonymity_classes(df, qi_cols, k)
    return classes.agg(
        F.coalesce(F.sum("class_n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.coalesce(
            F.sum(F.when(F.col("at_risk"), F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("risky_classes"),
        F.coalesce(
            F.sum(F.when(F.col("at_risk"), F.col("class_n")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("risky_rows"),
    ).select(
        "n_rows",
        "n_classes",
        "risky_classes",
        "risky_rows",
        F.expr(
            "CASE WHEN n_rows > 0 THEN CAST(risky_rows * 1000000 div n_rows"
            " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("risky_ppm"),
    )
