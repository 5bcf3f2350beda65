"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — a single narrow pass, JVM-side
arithmetic (F.zip_with/F.aggregate), no shuffle until the final top-k.
Scale path: random-hyperplane LSH bucketing — probe only matching
buckets (multi-probe over Hamming-1 neighbors for recall), turning
10^10 × q scans into per-bucket joins; exactness traded explicitly and
measured (tests assert recall against brute force).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``:
    (id, score rounded 4), ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(
            F.try_divide(
                _dot(F.col(vec_col).cast("array<double>"), q),
                F.lit(qn) * _norm(F.col(vec_col).cast("array<double>")),
            ),
            3,  # 3 decimals: stable across engines' float summation order
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (hash-based, no RNG
    state — reproducible across cluster sizes)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8], "big"
            )
            vals.append((h / 2**63) - 1.0)  # ~U(-1, 1)
        planes.append(vals)
    return planes


def lsh_bucketize(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 13,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add an int `bucket` column: sign pattern of ``n_planes`` random
    hyperplane projections (2^n_planes buckets)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        proj = _dot(v, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def probe_buckets(
    query_vec: list[float], n_planes: int = 8, seed: int = 13, multiprobe: int = 1
) -> set[int]:
    """The query's LSH bucket plus all buckets within ``multiprobe``
    bit-flips — driver-side constants (also used to build the SQL
    oracle, since the hyperplanes are md5-derived literals)."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qb = 0
    for i, plane in enumerate(planes):
        if sum(p * float(x) for p, x in zip(plane, query_vec)) >= 0:
            qb |= 1 << i
    probes = {qb}
    if multiprobe >= 1:
        probes |= {qb ^ (1 << i) for i in range(n_planes)}
    if multiprobe >= 2:
        probes |= {
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return probes


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe`` bit-flips of the query's bucket. With n_planes=8 and
    multiprobe=1 that's 9/256 of the corpus on uniform data."""
    dim = len(query_vec)
    bucketed = lsh_bucketize(df, dim, n_planes, seed, vec_col)
    probes = probe_buckets(query_vec, n_planes, seed, multiprobe)
    candidates = bucketed.filter(F.col("bucket").isin(*[int(p) for p in probes]))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def _sq_l2(vec_col, centroid: list[float]):
    """Squared L2 distance to a literal centroid: squares materialized
    then left-folded — the same op order as DuckDB's
    list_transform + list_aggregate('sum'), so distances are
    bit-comparable across engines."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def ivf_sample_centroids(
    df: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic codebook: the vectors with the ``n_centroids``
    smallest ids, in id order (cid = rank). Collecting the codebook is
    driver-side by design — it IS the index, a few KB. Production
    pipelines would train it offline (k-means); see
    :func:`ivf_refine_centroids` for the Lloyd step."""
    rows = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    return [list(r["v"]) for r in rows]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid): nearest centroid by squared L2, ties to the smallest
    cid (array_position returns the first minimum). One narrow map —
    no shuffle; the inverted-file partition of a 10^10-vector corpus."""
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_l2(v, c) for c in centroids])
    return df.select(
        F.col(id_col).alias("id"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cid"),
    )


def ivf_refine_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd refinement: re-center each cell on the mean of its members.
    Per-component sums run in DECIMAL(28,10) so the result is
    independent of partitioning/summation order (empty cells keep their
    previous centroid). Returns the refined codebook."""
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col)
        comp = (
            df.select(
                F.col(id_col).alias("id"),
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
            )
            .join(assigned, "id")
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(28,10)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]
        acc: dict[int, dict[int, tuple]] = {}
        for r in comp:
            acc.setdefault(int(r["cid"]), {})[int(r["pos"])] = (r["s"], int(r["n"]))
        for cid, by_pos in acc.items():
            new[cid] = [
                float(by_pos[p][0]) / by_pos[p][1] for p in sorted(by_pos)
            ]
        centroids = new
    return centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (faiss-IVFFlat shape): partition the corpus
    into ``n_centroids`` inverted cells, probe the ``nprobe`` cells
    nearest the query, brute-force cosine top-k within them. With
    ``refine_iters=0`` every step is deterministic arithmetic over the
    data + literals, so a SQL oracle can replay it exactly."""
    centroids = ivf_sample_centroids(df, n_centroids, id_col, vec_col)
    if refine_iters:
        centroids = ivf_refine_centroids(df, centroids, refine_iters, id_col, vec_col)
    # probe order: squared L2 of centroid vs query, computed with the
    # same left fold as the assignment (ties to the smaller cid)
    qd = sorted(
        (sum((x - y) * (x - y) for x, y in zip(c, query_vec)), cid)
        for cid, c in enumerate(centroids)
    )
    probes = [cid for _, cid in qd[:nprobe]]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    cand = df.join(
        assigned.filter(F.col("cid").isin(probes)).select(F.col("id").alias(id_col)),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_clusters(
    df: DataFrame,
    n_clusters: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means corpus clustering — the organize-before-curating step
    SemDeDup (Abbas et al. 2023) and cluster-balanced sampling
    pipelines run first: deterministic init (the ``n_clusters``
    smallest-id vectors), ``refine_iters`` Lloyd steps
    (:func:`ivf_refine_centroids` — per-component DECIMAL(28,10) sums
    so the means are partition-order-invariant, empty cells keep their
    centroid), then a final nearest-centroid assignment. Returns
    ``(id, cid, sq_dist round 3)`` for every vector.

    Scale shape: the codebook is KB-sized driver state by design (it
    IS the model); each Lloyd step is one narrow assignment map plus
    one (cid, component)-keyed aggregation bounded by
    ``n_clusters x dim`` output rows (map-side partial); the final
    assignment is a zero-shuffle projection against centroid
    literals. Every arithmetic step (left-fold squared L2, decimal
    sums, double division) is replayable in ANSI SQL, so the Lloyd
    step itself carries a full cross-engine oracle."""
    centroids = ivf_sample_centroids(df, n_clusters, id_col, vec_col)
    if refine_iters:
        centroids = ivf_refine_centroids(df, centroids, refine_iters, id_col, vec_col)
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_l2(v, c) for c in centroids])
    return df.select(
        F.col(id_col).alias("id"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cid"),
        F.round(F.array_min(dists), 3).alias("sq_dist"),
    )


def cluster_sample(
    df: DataFrame,
    per_cluster: int,
    n_clusters: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Cluster-balanced diversity sampling (the selection step after
    SemDeDup-style clustering, as in DCLM / prototypicality sampling,
    Sorscher et al. 2022): keep the ``per_cluster`` most prototypical
    members (nearest the refined centroid) of every k-means cluster,
    so the sample covers the embedding space instead of its densest
    mode. Rank is (sq_dist rounded to 3, id) — the rounding keeps the
    comparison cross-engine exact, the id breaks ties
    deterministically. Returns ``(id, cid, sq_dist, rank)``.

    Scale shape: one window exchange keyed on cid. That is
    scale-correct because ``n_clusters`` grows with the corpus in
    real pipelines (SemDeDup uses ~50k clusters) — per-cluster
    populations stay ~corpus/n_clusters, so no reducer sees more
    than a cell's worth of rows; the heavy lifting (assignment)
    happened in the zero-shuffle :func:`embedding_clusters` pass.
    Pass ``clusters`` (an :func:`embedding_clusters` output) to rank
    a precomputed clustering instead of re-training — the pipeline
    shape, same precedent as ``near_dup_clusters(pairs=...)``."""
    from pyspark.sql import Window

    if clusters is None:
        clusters = embedding_clusters(df, n_clusters, refine_iters, id_col, vec_col)
    w = Window.partitionBy("cid").orderBy(F.col("sq_dist").asc(), F.col("id").asc())
    return (
        clusters.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cluster)
        .select("id", "cid", "sq_dist", "rank")
    )


def pairwise_topk_per_label(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 4,
    score_below: float | None = None,
) -> DataFrame:
    """For each vector, its k nearest neighbors within the same label
    block (the blocked variant of the all-pairs similarity join):
    (id, neighbor, score). Ranking happens on the ROUNDED score
    (ties broken by neighbor id), so at ``decimals=3`` — the
    cross-engine-stable cosine precision — the top-k boundary is
    deterministic and oracle-exact. ``score_below`` filters the
    candidate set to rounded scores strictly below the bound BEFORE
    ranking (the hard-negative shape: nearest non-near-duplicates)."""
    from pyspark.sql import Window

    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    a = v.select(F.col("_id").alias("id"), F.col("_lbl"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("_id").alias("neighbor"), F.col("_lbl"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    scored = (
        a.join(b, "_lbl")
        .filter(F.col("id") != F.col("neighbor"))
        .withColumn(
            "score",
            F.round(F.try_divide(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")), decimals),
        )
    )
    if score_below is not None:
        scored = scored.filter(F.col("score") < F.lit(score_below))
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "neighbor", "score")
    )


# ---------------------------------------------------------------------------
# Product quantization (faiss-PQ shape): the compression tier of the ANN
# family. IVF prunes WHICH vectors are scanned; PQ shrinks WHAT is
# scanned — each vector becomes m small codes (here 4 codes over 16
# centroids = 16 bits/vector vs 64 float32 dims = 2048 bits), and query
# scoring is a per-subvector lookup-table sum (ADC, Jegou et al. 2011)
# that never touches the original embedding column.
# ---------------------------------------------------------------------------


def _py_sq_l2(a: list[float], b: list[float]) -> float:
    """Driver-side squared L2 with the same left-fold op order as
    :func:`_sq_l2` / the DuckDB oracle, so LUT literals are bit-equal
    to what either engine would compute."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + (float(x) - float(y)) * (float(x) - float(y))
    return s


def pq_codebooks(
    df: DataFrame,
    m_subvectors: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: subvector j of the ``n_codes``
    smallest-id vectors (codebooks[j][c] = code c of subquantizer j).
    Driver-side by design — m*n_codes*sub doubles, a few KB; production
    trains per-subspace k-means offline (the Lloyd step in
    :func:`ivf_refine_centroids` shows the distributed pattern)."""
    rows = (
        df.orderBy(id_col)
        .limit(n_codes)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    vecs = [list(r["v"]) for r in rows]
    dim = len(vecs[0])
    if dim % m_subvectors:
        raise ValueError(f"dim {dim} not divisible by m_subvectors {m_subvectors}")
    sub = dim // m_subvectors
    return [[v[j * sub : (j + 1) * sub] for v in vecs] for j in range(m_subvectors)]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..code_{m-1}): per subvector, the argmin-squared-L2
    code (ties to the smallest code, like :func:`ivf_assign`). One
    narrow zero-shuffle map — this IS the 100 TB win: downstream
    scans read m ints per vector instead of the embedding column."""
    v = F.col(vec_col).cast("array<double>")
    sub = len(codebooks[0][0])
    cols = [F.col(id_col).alias("id")]
    for j, cb in enumerate(codebooks):
        subv = F.slice(v, j * sub + 1, sub)
        dists = F.array(*[_sq_l2(subv, c) for c in cb])
        cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"code_{j}")
        )
    return df.select(*cols)


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m_subvectors: int = 4,
    n_codes: int = 16,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: encode the corpus
    with :func:`pq_encode`, precompute the query's squared-L2 LUT per
    (subquantizer, code) as driver-side literals, and score each vector
    as the fixed-order sum of m lookups — (id, approx_dist round 4),
    ascending, ties by id.

    With ``rerank > 0``: take the top ``rerank`` by ADC first, then
    exact cosine top-k over just those rows (the standard two-stage
    IVF-PQ serve path; only ``rerank`` embeddings are ever re-read)."""
    codebooks = pq_codebooks(df, m_subvectors, n_codes, id_col, vec_col)
    sub = len(codebooks[0][0])
    luts = [
        [_py_sq_l2(query_vec[j * sub : (j + 1) * sub], c) for c in cb]
        for j, cb in enumerate(codebooks)
    ]
    enc = pq_encode(df, codebooks, id_col, vec_col)
    adist = None
    for j in range(m_subvectors):
        term = F.element_at(
            F.array(*[F.lit(float(d)) for d in luts[j]]), F.col(f"code_{j}") + 1
        )
        adist = term if adist is None else adist + term
    scored = enc.select("id", F.round(adist, 4).alias("approx_dist"))
    if rerank:
        cand = scored.orderBy("approx_dist", "id").limit(rerank)
        keep = df.join(
            cand.select(F.col("id").alias(id_col)), id_col, "left_semi"
        )
        return cosine_topk(keep, query_vec, k, id_col, vec_col)
    return scored.orderBy("approx_dist", "id").limit(k)


def dense_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact multi-query cosine top-k: every corpus vector is scored
    against every query in the broadcast ``queries`` frame (bounded by
    the serving batch, never by corpus size) and the per-query top ``k``
    returned as (query_id, doc_id, rank, score) — score rounded to 3
    decimals (the cross-engine-stable cosine precision used throughout),
    ties broken by doc_id.

    Scale shape: ONE pass over the embeddings, scores computed in the
    scan task (zip_with/aggregate fold — no Python). The top-k is
    two-stage so no task ever holds a whole query's corpus: a window
    keyed on (query_id, scan-partition id) takes a partial top-k — the
    only exchange of the narrow (query_id, id, score) rows, keyed on
    ~partitions x queries values so a hot query never lands on one
    task — then the global window ranks the surviving
    queries x partitions x k rows (tiny).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(qvec_col).cast("array<double>").alias("_qv"),
        )
    )
    v = F.col(vec_col).cast("array<double>")
    scored = (
        df.withColumn("_pid", F.spark_partition_id())
        .crossJoin(q)
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            "_pid",
            F.round(
                F.try_divide(_dot(v, F.col("_qv")), _norm(v) * _norm(F.col("_qv"))),
                3,
            ).alias("score"),
        )
    )
    w_part = Window.partitionBy("query_id", "_pid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    w_glob = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("_pr", F.row_number().over(w_part))
        .filter(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(w_glob).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )


def knn_graph(
    df: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual k-NN graph over an embedding column — the standard
    precursor to graph-based corpus clustering / manifold dedup
    (each doc keeps its k nearest; an undirected edge survives only
    if BOTH endpoints keep each other). Returns ``(id_a, id_b,
    score)`` with ``id_a < id_b`` and cosine rounded to 3 decimals
    (the cross-engine-stable precision).

    Scale shape (the semantic_dup_pairs precedent): candidates are
    blocked by IVF cell — deterministic first-``n_cells`` codebook,
    argmin-L2 assignment in one narrow map — so the pairwise stage is
    per-cell, never corpus-all-pairs; per-vector top-k is a window
    over the (bounded) within-cell candidate set ranked on the
    ROUNDED score with id tie-break; the mutual filter is ONE
    self-join of the k-bounded kNN edge set on the reversed key.
    Cross-cell neighbors are missed by design (documented
    approximation, same contract as semantic_dup_pairs — raise
    ``n_cells`` resolution or probe multiple cells offline for higher
    recall)."""
    cents = ivf_sample_centroids(df, n_cells, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    blocked = df.join(
        assigned.select(F.col("id").alias(id_col), "cid"), id_col
    )
    knn = pairwise_topk_per_label(
        blocked, k=k, id_col=id_col, vec_col=vec_col, label_col="cid", decimals=3
    )
    rev = knn.select(
        F.col("neighbor").alias("id"), F.col("id").alias("neighbor")
    )
    return (
        knn.join(rev, ["id", "neighbor"], "left_semi")
        .filter(F.col("id") < F.col("neighbor"))
        .select(
            F.col("id").alias("id_a"),
            F.col("neighbor").alias("id_b"),
            "score",
        )
    )


def hard_negatives(
    df: DataFrame,
    k: int = 3,
    dup_threshold: float = 0.3,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding-model training
    (the in-batch-negatives upgrade of DPR, Karpukhin et al. 2020;
    SimCSE practice): per anchor, the ``k`` MOST similar candidates
    whose rounded cosine is strictly BELOW ``dup_threshold`` — close
    enough to be informative, not so close they are near-duplicate
    false negatives. Pair the threshold with the corpus dedup pass
    (``semantic_dup_pairs`` at the same bound) so "negative" and
    "duplicate" are decided by one number. Returns ``(anchor_id,
    neg_id, score)``; anchors with no below-threshold in-cell
    candidate emit nothing (sparse contract).

    Scale shape = :func:`knn_graph` without the mutual pass: IVF-cell
    blocking bounds the pairwise join (never corpus-all-pairs), the
    threshold filters BEFORE the per-anchor window ranks on the
    round-3 score with id tie-break — so the k-th boundary is
    cross-engine deterministic and the window input is the already-
    thresholded candidate set."""
    cents = ivf_sample_centroids(df, n_cells, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    blocked = df.join(
        assigned.select(F.col("id").alias(id_col), "cid"), id_col
    )
    negs = pairwise_topk_per_label(
        blocked,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        label_col="cid",
        decimals=3,
        score_below=dup_threshold,
    )
    return negs.select(
        F.col("id").alias("anchor_id"),
        F.col("neighbor").alias("neg_id"),
        "score",
    )


def embedding_communities(
    df: DataFrame,
    k: int = 4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    edges: DataFrame | None = None,
) -> DataFrame:
    """Semantic communities: connected components of the mutual kNN
    graph — the composition every embedding-space curation pass runs
    (SemDeDup-style pruning picks per-community representatives;
    topic balancing counts community sizes). ``(vec_id,
    community_id)`` with ``community_id`` the minimum member id;
    vectors with NO mutual edge are their own singleton community
    (included — a sampling pass must see every doc).

    Plumbing, not new machinery: :func:`knn_graph` bounds the edge set
    (k per node, mutual filter), ``dedup.connected_components``
    (large-star/small-star, one checkpointed job per round) labels it,
    and the singleton fill-in is one left join against the id column.
    Pass ``edges=`` to reuse an already-materialized kNN pair set (a
    real pipeline computes the kNN join once — the
    near_dup_clusters(pairs=) precedent).
    """
    from walker_spark.operators.dedup import connected_components

    if edges is None:
        edges = knn_graph(df, k=k, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    cc = connected_components(edges, id_a="id_a", id_b="id_b")
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .join(
            cc.select(
                F.col("doc_id").alias(id_col),
                F.col("cluster_id").alias("_cid"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("_cid", F.col(id_col)).cast("long").alias("community_id"),
        )
    )


def bitext_margin_pairs(
    df: DataFrame,
    side_col: str = "side",
    k: int = 4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_threshold_ppm: int = 1_000_000,
) -> DataFrame:
    """Margin-based bitext / parallel-pair mining (Artetxe & Schwenk
    2019, the CCMatrix/LASER alignment criterion): candidate pairs are
    CROSS-side (``side_col`` 0 = source corpus, 1 = target corpus),
    and each pair is scored not by raw cosine but by the RATIO margin

        margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

    which normalizes away hubness (a vector that is close to
    everything has a high neighborhood average and therefore needs a
    much higher raw cosine to qualify). Emitted pairs are MUTUAL best
    matches (y is x's argmax margin and vice versa) at or above
    ``margin_threshold_ppm`` — the standard forward-backward
    intersection that makes mining precision-dominant.

    Exact-integer contract: cosines are rounded to 3 decimals (the
    cross-engine-stable precision) then scaled to BIGINT milli-units;
    with ``n_x``/``n_y`` the actual positive-neighbor counts (<= k),

        margin_ppm = c_mil * 2 * n_x * n_y * 1e6
                     div (sum_x * n_y + sum_y * n_x)

    is pure BIGINT, so the DuckDB oracle replays every margin
    bit-for-bit. Neighborhoods count only POSITIVE rounded cosines
    (keeps every denominator > 0; a negative-similarity "neighbor" is
    noise in the margin normalizer anyway) — documented restriction.

    Scale shape (the knn_graph precedent): ONE shared IVF codebook
    assigns both sides, all candidate generation is within-cell
    cross-side (never corpus-all-pairs); per-vector neighborhood
    stats are windows over the bounded within-cell candidate set
    ranked on (c_mil desc, id asc); the mutual filter is two
    rank-1 windows over the margin-scored pair set. Cross-cell pairs
    are missed by design (same recall contract as semantic_dup_pairs
    — raise ``n_cells`` resolution offline for higher recall).
    Returns ``(src_id, tgt_id, score, margin_ppm)``; sides with no
    positive within-cell candidate emit nothing (sparse contract)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    cents = ivf_sample_centroids(df, n_cells, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    v = (
        df.join(assigned.select(F.col("id").alias(id_col), "cid"), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.col(side_col).cast("int").alias("side"),
            "cid",
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("nrm", _norm(F.col("vec")))
    )
    src = v.filter(F.col("side") == 0).select(
        F.col("id").alias("src_id"), "cid",
        F.col("vec").alias("vs"), F.col("nrm").alias("ns"),
    )
    tgt = v.filter(F.col("side") == 1).select(
        F.col("id").alias("tgt_id"), "cid",
        F.col("vec").alias("vt"), F.col("nrm").alias("nt"),
    )
    pairs = (
        src.join(tgt, "cid")
        .withColumn(
            "score",
            F.round(
                F.try_divide(
                    _dot(F.col("vs"), F.col("vt")),
                    F.col("ns") * F.col("nt"),
                ),
                3,
            ),
        )
        .withColumn(
            "c_mil", F.round(F.col("score") * 1000, 0).cast("long")
        )
        .filter(F.col("c_mil") > 0)
        .select("src_id", "tgt_id", "score", "c_mil")
    )
    w_s = Window.partitionBy("src_id").orderBy(
        F.col("c_mil").desc(), F.col("tgt_id").asc()
    )
    s_stats = (
        pairs.withColumn("_rk", F.row_number().over(w_s))
        .filter(F.col("_rk") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("c_mil").cast("long").alias("sum_s"),
            F.count(F.lit(1)).cast("long").alias("n_s"),
        )
    )
    w_t = Window.partitionBy("tgt_id").orderBy(
        F.col("c_mil").desc(), F.col("src_id").asc()
    )
    t_stats = (
        pairs.withColumn("_rk", F.row_number().over(w_t))
        .filter(F.col("_rk") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("c_mil").cast("long").alias("sum_t"),
            F.count(F.lit(1)).cast("long").alias("n_t"),
        )
    )
    scored = (
        pairs.join(s_stats, "src_id")
        .join(t_stats, "tgt_id")
        .withColumn(
            "margin_ppm",
            F.expr(
                "CAST(c_mil * 2 * n_s * n_t * 1000000"
                " div (sum_s * n_t + sum_t * n_s) AS BIGINT)"
            ),
        )
    )
    w_fwd = Window.partitionBy("src_id").orderBy(
        F.col("margin_ppm").desc(), F.col("tgt_id").asc()
    )
    w_bwd = Window.partitionBy("tgt_id").orderBy(
        F.col("margin_ppm").desc(), F.col("src_id").asc()
    )
    return (
        scored.withColumn("_rf", F.row_number().over(w_fwd))
        .withColumn("_rb", F.row_number().over(w_bwd))
        .filter(
            (F.col("_rf") == 1)
            & (F.col("_rb") == 1)
            & (F.col("margin_ppm") >= margin_threshold_ppm)
        )
        .select("src_id", "tgt_id", "score", "margin_ppm")
    )


def embedding_outliers(
    df: DataFrame | None = None,
    keep_ppm: int = 950_000,
    n_clusters: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space outlier flags — the distance-based quality
    filter run after k-means organization (the CLIP-filtering /
    SemDeDup-pipeline step that drops mislabeled or off-distribution
    points before training): a vector is an outlier iff it sits in
    the farthest ``1 - keep_ppm/1e6`` tail of its OWN cluster's
    distance distribution (per-cluster, so dense and sparse regions
    each keep their natural radius — a global threshold would gut
    sparse clusters and keep junk in dense ones).

    Exact tie-safe rule: with ``n_below`` = rows of the cluster whose
    rounded distance is STRICTLY smaller,

        is_outlier  <=>  n_below * 1e6 >= keep_ppm * cluster_n

    — pure BIGINT, whole tie-groups flag together, cross-engine
    bit-exact. Returns ``(id, cid, sq_dist, cluster_n, n_below,
    is_outlier)`` for every vector.

    Scale shape: distances come from the zero-shuffle
    :func:`embedding_clusters` assignment (pass ``clusters=`` to
    reuse a materialized clustering — the ``cluster_sample``
    precedent); ranking is the grouped_percentiles HISTOGRAM trick —
    per-(cid, milli-distance) bin counts, so the window partition is
    bounded by DISTINCT rounded distances per cluster (value
    resolution), never cluster population, and the flag joins back on
    the bin key (a sketch-sized table AQE broadcasts). No per-row
    rank, no hot window partition on a mega-cluster."""
    from pyspark.sql import Window

    if not 0 < keep_ppm < 1_000_000:
        raise ValueError(f"keep_ppm must be in (0, 1e6): {keep_ppm}")
    if clusters is None:
        if df is None:
            raise ValueError("need df or clusters")
        clusters = embedding_clusters(
            df, n_clusters, refine_iters, id_col, vec_col
        )
    m = clusters.withColumn(
        "_d_mil", F.round(F.col("sq_dist") * 1000, 0).cast("long")
    )
    hist = m.groupBy("cid", "_d_mil").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    w_below = (
        Window.partitionBy("cid")
        .orderBy("_d_mil")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy("cid")
    bins = hist.select(
        "cid",
        "_d_mil",
        F.coalesce(F.sum("_cnt").over(w_below), F.lit(0))
        .cast("long")
        .alias("n_below"),
        F.sum("_cnt").over(w_n).cast("long").alias("cluster_n"),
    )
    return m.join(bins, ["cid", "_d_mil"]).select(
        "id",
        "cid",
        "sq_dist",
        "cluster_n",
        "n_below",
        F.expr(f"n_below * 1000000 >= {keep_ppm} * cluster_n").alias(
            "is_outlier"
        ),
    )


def farthest_points(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Farthest-point sampling (Gonzalez 1985 greedy k-center) — the
    DIVERSITY selection complement to :func:`cluster_sample`'s
    prototypicality: starting from the minimum-id vector, each round
    adds the point farthest (max-min squared L2) from everything
    selected so far. The classic coreset / eval-set / annotation-
    budget picker: k points that 2-approximate the optimal k-center
    cover of the corpus.

    Returns ``(rank, id, radius)`` — ``radius`` is the chosen point's
    rounded (3) distance to the previously selected set (0.0 for the
    seed), which is also the corpus coverage radius achieved BEFORE
    that round; ranking on the rounded distance with id tie-break
    makes every pick cross-engine deterministic, and the DuckDB
    oracle replays all k rounds via unrolled CTEs.

    Scale shape: per-vector state is ONE double (min distance to the
    selected set); each round is a sort-limit argmax (TakeOrdered —
    never a full sort) plus a zero-exchange distance update against
    the new center as a DRIVER LITERAL (KB-sized by design, the IVF
    codebook precedent), localCheckpointed so lineage stays flat —
    2 bounded jobs per round, 2k total. Selection is inherently
    sequential in k (each pick depends on all previous), so k is the
    job count, not a shuffle count."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    spark = df.sparkSession
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    seed = v.orderBy(F.asc("id")).limit(1).collect()
    if not seed:
        return spark.createDataFrame([], "rank int, id long, radius double")
    centers = [(1, seed[0]["id"], 0.0)]
    cur = v.withColumn(
        "d", F.round(_sq_l2(F.col("vec"), list(seed[0]["vec"])), 3)
    ).localCheckpoint()
    for r in range(2, k + 1):
        top = cur.orderBy(F.desc("d"), F.asc("id")).limit(1).collect()
        if not top or top[0]["d"] is None:
            break
        centers.append((r, top[0]["id"], float(top[0]["d"])))
        cur = cur.withColumn(
            "d",
            F.least(
                F.col("d"),
                F.round(_sq_l2(F.col("vec"), list(top[0]["vec"])), 3),
            ),
        ).localCheckpoint()
    return spark.createDataFrame(centers, "rank int, id long, radius double")


def ivf_topk_multi(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Multi-query IVF approximate top-k — :func:`ivf_topk` for a
    SERVING BATCH of queries: the corpus is cell-assigned once, each
    query probes its ``nprobe`` nearest cells, and only probed-cell
    candidates are scored. Returns ``(query_id, doc_id, rank,
    score)`` with the round-3/id ranking contract of
    :func:`dense_topk`.

    Scale shape: the query batch is driver-collected (bounded serving
    batch — the codebook precedent) to compute the per-query probe
    list, which joins the cell-assigned corpus as a BROADCAST
    (queries x nprobe rows); per-(query, cell) candidates are scored
    in the scan task and top-k'd with the dense_topk two-stage window
    (no task ever ranks a whole query's candidate set)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    cents = ivf_sample_centroids(df, n_centroids, id_col, vec_col)
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("_qv"),
    ).collect()
    probe_pairs = []
    for r in qrows:
        qd = sorted(
            (
                sum((x - y) * (x - y) for x, y in zip(c, r["_qv"])),
                cid,
            )
            for cid, c in enumerate(cents)
        )
        probe_pairs.extend(
            (r["query_id"], cid) for _, cid in qd[:nprobe]
        )
    probes = spark.createDataFrame(probe_pairs, "query_id int, cid int")
    q = F.broadcast(
        spark.createDataFrame(
            [(r["query_id"], list(r["_qv"])) for r in qrows],
            f"query_id int, _qv array<double>",
        )
    )
    assigned = ivf_assign(df, cents, id_col, vec_col)
    v = F.col(vec_col).cast("array<double>")
    scored = (
        df.join(assigned.select(F.col("id").alias(id_col), "cid"), id_col)
        .join(F.broadcast(probes), "cid")
        .join(q, "query_id")
        .withColumn("_pid", F.spark_partition_id())
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            "_pid",
            F.round(
                F.try_divide(
                    _dot(v, F.col("_qv")), _norm(v) * _norm(F.col("_qv"))
                ),
                3,
            ).alias("score"),
        )
    )
    w_part = Window.partitionBy("query_id", "_pid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    w_glob = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("_pr", F.row_number().over(w_part))
        .filter(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(w_glob).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )


def ivf_recall_report(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """ANN quality evaluation — recall@k of the IVF serving path
    against exact brute force, per query: the harness every ANN
    deployment runs before trusting an index (faiss benchmark shape).
    Returns ``(query_id, hits, k, recall_ppm)`` with ``recall_ppm =
    hits * 1e6 div k`` — both sides use the identical round-3/id
    ranking contract, so the overlap (and therefore the recall
    number) is cross-engine exact, and the oracle replays BOTH
    retrieval paths.

    Scale shape: one exact :func:`dense_topk` pass + one
    :func:`ivf_topk_multi` pass, then a (query, doc)-keyed join of
    two k-bounded result sets — evaluation cost is two serving runs,
    never more."""
    exact = dense_topk(
        df, queries, k, id_col, vec_col, query_id_col, qvec_col
    ).select("query_id", "doc_id")
    approx = ivf_topk_multi(
        df, queries, k, n_centroids, nprobe,
        id_col, vec_col, query_id_col, qvec_col,
    ).select("query_id", "doc_id", F.lit(1).alias("_hit"))
    return (
        exact.join(approx, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("hits")
        )
        .select(
            "query_id",
            "hits",
            F.lit(int(k)).cast("long").alias("k"),
            F.expr(f"CAST(hits * 1000000 div {int(k)} AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )
