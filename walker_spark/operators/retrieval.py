"""Lexical retrieval over the documents table: distributed BM25.

The inverted-index shape, Spark-first: postings are a (doc, term, tf)
aggregate, per-term document frequencies are computed only for the
terms the query set actually needs (query terms broadcast into the
postings scan — the full-vocabulary statistics table never
materializes), and scoring is one broadcast join + one aggregation
keyed on (query, doc). All JVM-side; cross-engine exact via integer
micro-unit accumulation (see below).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window, functions as F

# Per-(query,doc) scores are sums of per-term double contributions —
# floating-point, so the accumulation order would differ between
# engines / partitionings. Each term contribution is therefore
# quantized to integer micro-units (floor(x * 1e6 + 0.5)) before the
# sum: integer addition is exact and order-invariant, so the final
# score is bit-identical on any partitioning and in the DuckDB oracle.
MICRO = 1_000_000


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Exact-phrase retrieval: which documents contain each query
    phrase as a contiguous token run, how often, and where first.

    Returns ``(phrase_id, doc_id, n_hits, first_pos)`` — one row per
    (phrase, doc) with at least one hit; ``first_pos`` is the 0-based
    token offset of the earliest occurrence.

    Scale shape: the corpus is scanned exactly ONCE. The distinct
    phrase token-lengths are collected to the driver (bounded by the
    query set, like the IVF codebook), and one projection emits every
    positional n-gram of every needed length as an md5 key — no
    per-length re-scan, no shuffle until the per-(phrase, doc)
    aggregate, and the join against the phrase keys is a broadcast
    (query set ≪ corpus). Gram keys are md5 of the space-joined
    token run, so the exchange after the match moves 32-byte keys and
    two longs, never text.
    """
    from walker_spark.operators.dedup import tokens

    ptoks = F.filter(tokens(F.col(phrase_col)), lambda s: F.length(s) > 0)
    pkeys = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.md5(F.encode(F.concat_ws(" ", ptoks), "UTF-8")).alias("gram_key"),
        F.size(ptoks).alias("_n"),
    ).filter(F.col("_n") > 0)
    # distinct phrase lengths: driver-bounded by the query set
    lengths = sorted(r["_n"] for r in pkeys.select("_n").distinct().collect())
    if not lengths:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], "phrase_id int, doc_id long, n_hits long, first_pos long"
        )

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    ).filter(F.size("_t") >= lengths[0])
    # one projection, all needed n-gram lengths: flatten the per-length
    # positional gram arrays, then a single explode. The lambda MUST be
    # unary — transform() passes the array index to a binary lambda,
    # which would silently shadow the captured n.
    def _gram_arr(n: int):
        return F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.encode(F.concat_ws(" ", F.slice("_t", i + 1, n)), "UTF-8")
                    ).alias("gram_key"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram_key:string>>"))

    per_n = [_gram_arr(n) for n in lengths]
    grams = base.select(
        "doc_id", F.explode(F.flatten(F.array(*per_n))).alias("_g")
    ).select(
        "doc_id",
        F.col("_g.pos").cast("long").alias("pos"),
        F.col("_g.gram_key").alias("gram_key"),
    )
    return (
        grams.join(F.broadcast(pkeys.select("phrase_id", "gram_key")), "gram_key")
        .groupBy("phrase_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("pos").alias("first_pos"),
        )
        .select("phrase_id", "doc_id", "n_hits", "first_pos")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """BM25 top-k retrieval (Robertson & Zaragoza 2009; idf is the
    BM25+ variant ln(1 + (N - df + 0.5)/(df + 0.5)), always positive):

        score(q, d) = sum over query terms t of
            idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Returns (query_id, doc_id, rank, n_matched, score) — top ``k``
    documents per query by (score desc, doc_id asc); ``score`` is the
    micro-unit sum rounded half-up to 4 decimals in exact integer
    math, so it is bit-identical cross-engine (the ranking therefore
    is too).

    Scale shape: the corpus is touched exactly once (tokenize +
    explode + one groupBy keyed on (doc, term) — per-document keys, so
    the shuffle distributes perfectly); everything after operates on
    postings matched to the broadcast query-term set, which is bounded
    by |queries| x terms-per-query, never by vocabulary or corpus
    size. N and avgdl ride the plan as a broadcast scalar; df(t) is
    computed from the matched postings only and broadcasts back. The
    final top-k is a per-query window over candidate docs.
    """
    base = _tokenized(docs, id_col, text_col)
    postings = _postings(base)
    stats = _corpus_stats(base)
    qterms = _query_terms(queries, query_id_col, query_col)
    terms_needed = qterms.select("term").distinct()
    matched = postings.join(F.broadcast(terms_needed), "term")
    # df(t) over matched postings only (rows are distinct per (id,term))
    dfreq = matched.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("dfreq"))
    return _score_and_topk(matched, dfreq, stats, qterms, k, k1, b)


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from walker_spark.operators.dedup import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    return docs.select(F.col(id_col).alias("id"), toks.alias("_t")).filter(
        F.size("_t") > 0
    )


def _postings(base: DataFrame) -> DataFrame:
    # (id, term, tf, dl): dl rides the groupBy key (functionally
    # dependent on id) so no join back to a doc-length table is needed.
    return (
        base.select("id", F.size("_t").cast("long").alias("dl"), F.explode("_t").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _corpus_stats(base: DataFrame) -> DataFrame:
    # corpus stats as a one-row broadcast scalar; avgdl from exact
    # integer sums so both engines divide the same two numbers.
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("_N"),
        F.sum(F.size("_t").cast("long")).alias("_dl_sum"),
    )


def _query_terms(queries: DataFrame, query_id_col: str, query_col: str) -> DataFrame:
    from walker_spark.operators.dedup import tokens

    # distinct query terms, broadcast into the postings scan
    return queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.filter(tokens(F.col(query_col)), lambda s: F.length(s) > 0))).alias(
            "term"
        ),
    )


def _score_and_topk(
    matched: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    scored_terms = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "id",
            F.floor(
                (
                    F.log(
                        F.lit(1.0)
                        + (F.col("_N") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
                    )
                    * (F.col("tf") * (k1 + 1))
                    / (
                        F.col("tf")
                        + k1
                        * (
                            1.0
                            - b
                            + b
                            * F.col("dl").cast("double")
                            / (F.col("_dl_sum").cast("double") / F.col("_N"))
                        )
                    )
                )
                * MICRO
                + 0.5
            )
            .cast("long")
            .alias("_micro"),
        )
    )
    per_query = (
        scored_terms.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_matched"),
            F.sum("_micro").alias("_sum_micro"),
        )
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            "n_matched",
            # exact half-up at 4 decimals in integer math: the micro
            # sum is a non-negative exact int, and sums ending in
            # ...50 DO occur — engine round() (shortest-repr HALF_UP
            # on Spark, binary round in DuckDB) would disagree there.
            (F.floor((F.col("_sum_micro") + 50) / 100).cast("double") / 10000.0).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "n_matched", "score")
    )


class PostingsIndex(NamedTuple):
    """Persistable inverted-index tables for BM25 serving — the
    corpus text is read ONCE at build time; query batches afterwards
    join these tables only (the minhash_index precedent applied to
    lexical retrieval).

    * ``postings``: (term, id, tf, dl) — one row per (doc, term).
    * ``dfreq``: (term, dfreq) — full-vocabulary document frequencies.
    * ``stats``: one row (_N, _dl_sum) — corpus size / length sum.

    All three are plain DataFrames: write them as tables and read them
    back to serve; schemas are stable and contain no text.
    """

    postings: DataFrame
    dfreq: DataFrame
    stats: DataFrame


def build_postings_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> PostingsIndex:
    """One corpus scan -> the three BM25 index tables. ``dfreq`` here
    is computed over the whole vocabulary (unlike the ad-hoc
    :func:`bm25_topk`, which only needs it for the query terms), but
    it is exactly one row per distinct term — vocabulary-sized, far
    below corpus-sized, and the values are identical to the ad-hoc
    path's by construction (both count docs containing the term)."""
    base = _tokenized(docs, id_col, text_col)
    postings = _postings(base)
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    return PostingsIndex(postings, dfreq, _corpus_stats(base))


def extend_postings_index(
    index: PostingsIndex,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> PostingsIndex:
    """Append a document batch to a :class:`PostingsIndex` WITHOUT
    re-reading the already-indexed corpus — the daily-increment shape
    (minhash_index -> incremental_near_dups precedent, applied to the
    lexical tier). Bit-identical to rebuilding over the union corpus
    (parity pytest-asserted): postings rows union, per-term dfreq adds
    (a full-outer merge on the vocabulary — vocabulary-scale, never
    corpus-scale), and the one-row stats add.

    Contract: ``new_docs`` ids must be disjoint from the indexed ids
    (same as any append-only index; re-adding a doc would double-count
    its postings). Only the NEW batch's text is tokenized — the
    existing index tables pass through untouched, so persisting the
    result writes small deltas plus the merged vocabulary table."""
    base = _tokenized(new_docs, id_col, text_col)
    new_postings = _postings(base)
    new_dfreq = new_postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    merged_dfreq = (
        index.dfreq.withColumnRenamed("dfreq", "_a")
        .join(new_dfreq.withColumnRenamed("dfreq", "_b"), "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("_a"), F.lit(0))
                + F.coalesce(F.col("_b"), F.lit(0))
            )
            .cast("long")
            .alias("dfreq"),
        )
    )
    merged_stats = (
        index.stats.unionByName(_corpus_stats(base))
        .agg(
            F.sum("_N").cast("long").alias("_N"),
            F.sum("_dl_sum").cast("long").alias("_dl_sum"),
        )
    )
    return PostingsIndex(
        index.postings.unionByName(new_postings), merged_dfreq, merged_stats
    )


def retract_postings_index(
    index: PostingsIndex,
    doc_ids: DataFrame,
    id_col: str = "doc_id",
) -> PostingsIndex:
    """Delete a document set from a :class:`PostingsIndex` WITHOUT
    re-reading any corpus text — the takedown/expiry shape that
    completes the index lifecycle next to :func:`build_postings_index`
    (full build) and :func:`extend_postings_index` (append): crawl
    corpora retract documents constantly (robots revocation, DMCA,
    recrawl 404s, dedup keeper decisions) and a 10^10-doc index cannot
    afford a rebuild per takedown batch. Bit-identical to rebuilding
    over the surviving corpus (parity pytest-asserted).

    Mechanics — the retracted docs' term statistics are recovered from
    the index itself, never from text:

    * removed postings = one semi-join of the postings table on the id
      set (broadcast-able: takedown batches are small);
    * per-term dfreq decrements by the removed docs' term counts (one
      vocabulary-scale left join; terms whose dfreq reaches 0 drop —
      exactly what a rebuild would produce);
    * the one-row stats subtract the removed docs' count and length
      sum, recovered from the DISTINCT (id, dl) pairs of the removed
      postings (every indexed doc has >= 1 posting carrying dl, since
      empty docs are never indexed — _tokenized filters them).

    Ids absent from the index retract as no-ops. Persisting the result
    writes the filtered postings plus a vocabulary-scale dfreq table —
    on a merge-on-read table format the postings filter is a delete-
    file commit, O(removed), not O(index).
    """
    ids = doc_ids.select(F.col(id_col).alias("id")).distinct()
    removed = index.postings.join(F.broadcast(ids), "id", "left_semi")
    kept = index.postings.join(F.broadcast(ids), "id", "left_anti")
    rem_dfreq = removed.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("_r")
    )
    new_dfreq = (
        index.dfreq.join(rem_dfreq, "term", "left")
        .select(
            "term",
            (F.col("dfreq") - F.coalesce(F.col("_r"), F.lit(0)))
            .cast("long")
            .alias("dfreq"),
        )
        .filter(F.col("dfreq") > 0)
    )
    rem_stats = (
        removed.select("id", "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("_rn"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("_rdl"),
        )
    )
    new_stats = index.stats.crossJoin(F.broadcast(rem_stats)).select(
        (F.col("_N") - F.col("_rn")).cast("long").alias("_N"),
        (F.col("_dl_sum") - F.col("_rdl")).cast("long").alias("_dl_sum"),
    )
    return PostingsIndex(kept, new_dfreq, new_stats)


def bm25_topk_indexed(
    index: PostingsIndex,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """BM25 top-k served from a prebuilt :class:`PostingsIndex` —
    bit-identical output to :func:`bm25_topk` on the same corpus
    (parity pytest-asserted), but the corpus text is never touched:
    the postings table is filtered by the broadcast query-term set and
    everything downstream is bounded by |queries| x terms-per-query.
    This is the daily-serving shape: build once, serve many batches.
    """
    qterms = _query_terms(queries, query_id_col, query_col)
    terms_needed = qterms.select("term").distinct()
    matched = index.postings.join(F.broadcast(terms_needed), "term")
    dfreq = index.dfreq.join(F.broadcast(terms_needed), "term")
    return _score_and_topk(matched, dfreq, index.stats, qterms, k, k1, b)


# Reciprocal-rank-fusion contributions are 1/(rrf_k + rank) — not
# representable exactly in binary, so each is quantized by EXACT
# integer division (RRF_SCALE div (rrf_k + rank)) before the sum; the
# fused score is then a plain BIGINT, order-invariant and bit-identical
# in the DuckDB oracle (same rule as the BM25 micro-units).
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    legs: dict[str, DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    scale: int = RRF_SCALE,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) over
    named ranked lists: each leg is a (query_id, doc_id, rank)
    DataFrame; a document's fused score is the exact-integer sum of
    ``scale div (rrf_k + rank)`` over the legs that retrieved it.

    Returns (query_id, doc_id, rank, rrf_score, n_legs, <name>_rank
    per leg — 0 when that leg did not retrieve the doc), the top ``k``
    per query by (rrf_score desc, doc_id asc).

    Scale shape: the legs are already top-k_leg bounded, so everything
    here is |queries| x legs x k_leg rows — one union, one groupBy on
    (query_id, doc_id) that also pivots the per-leg ranks (no join per
    leg), one window over the bounded fused set.
    """
    names = list(legs)
    tagged = None
    for name, leg in legs.items():
        t = leg.select(
            "query_id",
            "doc_id",
            F.lit(name).alias("_leg"),
            F.col("rank").cast("long").alias("_r"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    contrib = tagged.withColumn(
        "_c", F.expr(f"{scale} div ({rrf_k} + _r)").cast("long")
    )
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("_c").cast("long").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_legs"),
        *[
            F.coalesce(
                F.max(F.when(F.col("_leg") == name, F.col("_r"))), F.lit(0)
            )
            .cast("int")
            .alias(f"{name}_rank")
            for name in names
        ],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            "rrf_score",
            "n_legs",
            *[f"{name}_rank" for name in names],
        )
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    example_ids: list[int],
    k: int = 10,
    k_leg: int = 20,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid query-by-example retrieval ("more like this"): for each
    example document, run a lexical BM25 leg (the example's text as
    the query) and a dense cosine leg (the example's embedding as the
    query vector) over the corpus of documents that have embeddings,
    then fuse the two top-``k_leg`` lists with :func:`rrf_fuse`.

    The example document itself is always dense rank 1 (cosine 1.0
    with itself) but NOT necessarily BM25 rank 1 — a doc repeating the
    example's rare terms more densely can out-score it lexically.
    Callers wanting pure neighbours drop rows where doc_id ==
    query_id.

    Scale shape: the text/embedding join shuffles on the doc key once
    per leg (bucket both tables by doc id to make it storage-
    partitioned); each leg then touches the corpus exactly once (BM25:
    postings groupBy; dense: one scored scan) and the fusion operates
    on |examples| x 2 x k_leg rows only.
    """
    from walker_spark.operators.similarity import dense_topk

    corpus = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).join(
        embeddings.select(
            F.col(vec_id_col).alias("id"), F.col(vec_col).alias("vec")
        ),
        "id",
    )
    ex = [int(i) for i in example_ids]
    qtext = corpus.filter(F.col("id").isin(ex)).select(
        F.col("id").alias("query_id"), F.col("text").alias("query")
    )
    qvec = corpus.filter(F.col("id").isin(ex)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    bm25 = bm25_topk(corpus, qtext, k=k_leg, k1=k1, b=b, id_col="id", text_col="text")
    dense = dense_topk(corpus, qvec, k=k_leg, id_col="id", vec_col="vec")
    return rrf_fuse({"bm25": bm25, "dense": dense}, k=k, rrf_k=rrf_k)


def bm25_pruned_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_impact: int = 32,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """BM25 top-k via IMPACT-ORDERED list pruning with a Fagin-style
    threshold certificate (Fagin et al. 2003 TA; impact-ordered
    indexes are how production engines avoid scoring every matching
    document). Output is PROVABLY identical to :func:`bm25_topk` —
    same columns, same rows — because pruning only applies where the
    certificate holds and every other query falls back to exhaustive
    scoring:

    1. per-(term, doc) integer micro impacts are static given corpus
       stats; each term keeps its top ``n_impact`` postings by
       (impact desc, id) — the impact lists;
    2. candidates(q) = docs on ANY of q's lists; theta(q) = sum over
       q's terms of the rank-``n_impact`` impact (0 when the term's
       whole list fits — that term can hide nothing). Any doc outside
       every list scores <= theta(q);
    3. certificate: NO term of q was truncated (candidates are then
       literally ALL matched docs), or the k-th candidate's ROUNDED
       score is STRICTLY above rounded theta — strict + rounded
       because ranking ties break on doc_id, so an outside doc merely
       EQUAL at the boundary could still displace rank k (and a term
       truncated at impact 0 makes theta 0 without covering its
       tail, so theta == 0 alone certifies nothing);
    4. queries failing the certificate are re-scored exhaustively
       (anti-join on the passing set) and unioned back.

    Scale shape: impacts derive from one postings pass and are
    localCheckpointed (three consumers — lists, candidate rescoring,
    fallback — must share one computation: the dsir explode-once
    precedent); the per-term top-N window is the serving-index build
    (a stopword's full posting list ranks in one partition — build
    the lists offline per index segment, or two-level salt, for a
    web-scale vocabulary); everything per-query afterwards is bounded
    by |q terms| x n_impact candidates instead of every doc matching
    any term — which is the entire point when one query term is 'the'.
    """
    from pyspark.sql import Window as W

    if n_impact < 1:
        raise ValueError(f"n_impact must be >= 1: {n_impact}")
    base = _tokenized(docs, id_col, text_col)
    postings = _postings(base)
    stats = _corpus_stats(base)
    qterms = _query_terms(queries, query_id_col, query_col)
    terms_needed = qterms.select("term").distinct()
    matched = postings.join(F.broadcast(terms_needed), "term")
    dfreq = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "id",
            F.floor(
                (
                    F.log(
                        F.lit(1.0)
                        + (F.col("_N") - F.col("dfreq") + 0.5)
                        / (F.col("dfreq") + 0.5)
                    )
                    * (F.col("tf") * (k1 + 1))
                    / (
                        F.col("tf")
                        + k1
                        * (
                            1.0
                            - b
                            + b
                            * F.col("dl").cast("double")
                            / (F.col("_dl_sum").cast("double") / F.col("_N"))
                        )
                    )
                )
                * MICRO
                + 0.5
            )
            .cast("long")
            .alias("_micro"),
        )
        .localCheckpoint()
    )
    wt = W.partitionBy("term").orderBy(F.col("_micro").desc(), F.col("id").asc())
    lists = scored.withColumn("_r", F.row_number().over(wt)).filter(
        F.col("_r") <= n_impact
    )
    bounds = lists.groupBy("term").agg(
        F.max(F.when(F.col("_r") == n_impact, F.col("_micro"))).alias("_cut")
    )
    thetas = (
        qterms.join(bounds, "term", "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("_cut"), F.lit(0))).alias("_theta"),
            F.max(
                F.when(F.col("_cut").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("_trunc"),
        )
    )
    cands = (
        qterms.join(lists.select("term", "id"), "term")
        .select("query_id", "id")
        .distinct()
    )

    def _score(per_qdoc):
        w = W.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return per_qdoc.select(
            "query_id",
            F.col("id").alias("doc_id"),
            "n_matched",
            "_sum_micro",
            (
                F.floor((F.col("_sum_micro") + 50) / 100).cast("double")
                / 10000.0
            ).alias("score"),
        ).withColumn("rank", F.row_number().over(w).cast("int"))

    qdoc = (
        scored.join(F.broadcast(qterms), "term")
        .join(cands, ["query_id", "id"], "left_semi")
        .groupBy("query_id", "id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_matched"),
            F.sum("_micro").alias("_sum_micro"),
        )
    )
    ranked = _score(qdoc)
    kth = ranked.filter(F.col("rank") == k).select(
        "query_id", F.col("_sum_micro").alias("_kth")
    )
    ncand = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("_nc")
    )
    flags = (
        thetas.join(ncand, "query_id", "left")
        .join(kth, "query_id", "left")
        .select(
            "query_id",
            (
                (F.col("_trunc") == 0)
                | (
                    (F.coalesce(F.col("_nc"), F.lit(0)) >= k)
                    & (
                        F.floor((F.coalesce(F.col("_kth"), F.lit(0)) + 50) / 100)
                        > F.floor((F.col("_theta") + 50) / 100)
                    )
                )
            ).alias("_ok"),
        )
    )
    ok_q = flags.filter(F.col("_ok")).select("query_id")
    pruned_out = (
        ranked.join(F.broadcast(ok_q), "query_id", "left_semi")
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "n_matched", "score")
    )
    fb_qterms = qterms.join(F.broadcast(ok_q), "query_id", "left_anti")
    fb = (
        scored.join(F.broadcast(fb_qterms), "term")
        .groupBy("query_id", "id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_matched"),
            F.sum("_micro").alias("_sum_micro"),
        )
    )
    fb_out = (
        _score(fb)
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "n_matched", "score")
    )
    return pruned_out.unionByName(fb_out)
