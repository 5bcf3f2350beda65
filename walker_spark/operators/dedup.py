"""Document deduplication operators for training-data pipelines.

Beyond the reference's crawl-time dedup (URL-seen J1 and duplicate-
content query-param clustering J5/A5), a 100 TB corpus needs
content-level dedup. All operators are DataFrame-native; Python only
appears in Arrow-batched pandas UDFs (simhash bit-packing).

Scale notes (10^10 docs):
* exact: one hash-shuffle on a 64-bit content hash — xxhash64 JVM-side,
  AQE handles skew from boilerplate dups.
* MinHash+LSH: signatures via explode+groupBy (shuffle on doc_id is
  avoided — shingles are generated and min-aggregated in one pass);
  banding turns O(n^2) pairs into per-bucket joins; candidates are
  verified with exact Jaccard so output is exact at the chosen
  threshold (LSH only prunes).
* SimHash: 64-bit signature, near-dup = hamming<=k via band rotation
  (k+1 bands -> pigeonhole guarantees a matching band).
* embedding near-dup: cosine over `array<float>` with JVM-side
  aggregate expressions; see also similarity.py for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalized_text(col):
    """Whitespace-collapsed, lower-cased text (shared by all dedup ops
    so results are stable against trivial formatting)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col):
    return F.split(normalized_text(col), " ")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_key(text_col):
    """128-bit content identity for exact dedup: md5 of the normalized
    text. Grouping on the hash instead of the text keeps the shuffle
    key 32 bytes — at 100 TB the exchange moves keys, not documents.
    Collision odds at 10^10 docs ~2^-64."""
    return F.md5(F.encode(normalized_text(text_col), "UTF-8"))


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    (keeper, n_dups) — keeper is the smallest id in each group."""
    return (
        df.groupBy(_content_key(F.col(text_col)).alias("content_key"))
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .select("keeper", "n_docs")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivors after exact dedup: the smallest id per distinct
    normalized text (hash-groupBy on the 128-bit content key; one
    narrow shuffle)."""
    return (
        df.groupBy(_content_key(F.col(text_col)).alias("content_key"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise over exploded shingles)
# ---------------------------------------------------------------------------


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-grams per doc. n=1 -> word sets."""
    toks = tokens(F.col(text_col))
    if n == 1:
        sh = F.explode(toks)
    else:
        # sliding window over the token array, JVM-side
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        sh = F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )
    return df.select(F.col(id_col).alias("_id"), sh.alias("shingle")).where(
        F.length("shingle") > 0
    ).dropDuplicates(["_id", "shingle"])


def _set_groups(sh: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse identical shingle sets: returns ``(members, reps)``.

    ``members`` = (_id, set_key, sz); ``reps`` = the min-_id member per
    distinct set. All pairwise work downstream runs on *distinct sets
    only* — a corpus where 10^6 docs share one boilerplate text costs
    one representative in the join and pure (unavoidable) output fan-out
    at expansion, instead of a 10^12-row shingle join.

    set_key is md5 over the sorted shingle set (128-bit: collision odds
    are ~2^-64 even at 10^10 docs — the same identity scheme exact-dedup
    at 100 TB would use)."""
    members = sh.groupBy("_id").agg(
        F.md5(F.concat_ws("\x00", F.sort_array(F.collect_set("shingle")))).alias("set_key"),
        F.count(F.lit(1)).alias("sz"),
    )
    reps = members.groupBy("set_key").agg(
        F.min("_id").alias("_id"), F.first("sz").alias("sz")
    )
    return members, reps


def _expand_set_pairs(
    set_pairs: DataFrame, members: DataFrame, threshold: float
) -> DataFrame:
    """Doc-level (id_a < id_b, jaccard) pairs from set-level matches:
    cross-group expansion of qualifying distinct-set pairs, plus all
    within-group pairs (identical sets -> jaccard exactly 1.0, which
    passes any threshold <= 1)."""
    ma = members.select(F.col("set_key").alias("k_a"), F.col("_id").alias("ia"))
    mb = members.select(F.col("set_key").alias("k_b"), F.col("_id").alias("ib"))
    cross = (
        set_pairs.join(ma, "k_a")
        .join(mb, "k_b")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "jaccard",
        )
    )
    within = (
        ma.join(
            members.select(F.col("set_key").alias("k_a"), F.col("_id").alias("ib")),
            "k_a",
        )
        .filter(F.col("ia") < F.col("ib"))
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within).filter(F.col("jaccard") >= threshold)


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """All doc pairs (a < b) with shingle-set Jaccard >= threshold:
    (id_a, id_b, jaccard rounded to 4). Exact, and join-safe on skewed
    corpora via two public techniques:

    * identical shingle sets collapse to one representative before any
      join (:func:`_set_groups`) — duplicate-heavy corpora cost output
      size, not join size;
    * prefix filtering (AllPairs/PPJoin, Xiao et al.): under a global
      rarest-first shingle order, sim(x,y) >= t implies the prefixes of
      length |x| - ceil(t*|x|) + 1 share a shingle, so only those
      prefix shingles are join keys. Stopword-like shingles (high
      document frequency) land at the back of the order and are never
      joined on unless a set is almost entirely stopwords."""
    sh = _shingles(df, id_col, text_col, shingle_n)
    members, reps = _set_groups(sh)
    rep_sh = sh.join(reps.select("_id"), "_id", "left_semi")

    # global rarest-first order: (document frequency over distinct sets,
    # shingle) — computed once, one groupBy
    dfreq = rep_sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "shingle")
    ranked = (
        rep_sh.join(dfreq, "shingle")
        .withColumn("_rn", F.row_number().over(w))
    )
    prefix = ranked.join(reps.select("_id", "sz"), "_id").filter(
        F.col("_rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )
    # size-compatibility inside the join (see minhash_lsh_pairs): a
    # prefix collision between sets with t*max(sz) > min(sz) can never
    # verify, so it is dropped before the candidate dedup shuffle
    pa = prefix.select(F.col("_id").alias("id_a"), "shingle", F.col("sz").alias("sza"))
    pb = prefix.select(F.col("_id").alias("id_b"), "shingle", F.col("sz").alias("szb"))
    cand = (
        pa.join(
            pb,
            (pa["shingle"] == pb["shingle"])
            & (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(threshold) * F.greatest("sza", "szb")
                <= F.least("sza", "szb")
            ),
        )
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    verified = _verify_jaccard(cand, rep_sh, threshold)
    set_pairs = (
        verified.join(
            members.select(F.col("_id").alias("id_a"), F.col("set_key").alias("k_a")),
            "id_a",
        )
        .join(
            members.select(F.col("_id").alias("id_b"), F.col("set_key").alias("k_b")),
            "id_b",
        )
        .select("k_a", "k_b", "jaccard")
    )
    return _expand_set_pairs(set_pairs, members, threshold)


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate pairs via JVM-side array_intersect
    over the pair's two shingle sets — O(|cand| x set size), no explode,
    never a function of shingle document frequency."""
    sets = sh.groupBy("_id").agg(F.sort_array(F.collect_set("shingle")).alias("_set"))
    a = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    b = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("_sa") + F.size("_sb") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, sig array<long>): minimum of xxhash64(shingle, seed_i)
    per permutation — one explode + one groupBy, all JVM-side."""
    sh = _shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sigs = sh.groupBy("_id").agg(*aggs)
    return sigs.select("_id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs by MinHash banding, verified with exact shingle
    Jaccard (LSH candidates only prune; output is exact at the
    threshold): (id_a, id_b, jaccard). bands*rows == num_perm."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sh = _shingles(df, id_col, text_col, shingle_n)
    # Identical shingle sets collapse to one representative before
    # signatures/banding: duplicate-heavy corpora (the common case at
    # 100 TB) would otherwise put g identical signatures in every band
    # bucket — a g^2 banding join for pairs that are knowably jaccard
    # 1.0. Distinct sets only go through LSH; groups expand at the end.
    members, reps = _set_groups(sh)
    rep_sh = sh.join(reps.select("_id"), "_id", "left_semi")
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sigs = rep_sh.groupBy("_id").agg(*aggs).select(
        "_id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col("sig")[b * rows + r] for r in range(rows)]).alias("bh")
        for b in range(bands)
    ]
    banded = sigs.join(reps.select("_id", "sz"), "_id").select(
        "_id", "sz", F.explode(F.array(*band_cols)).alias("band_hash")
    )
    # Size-compatibility pruning (exact necessary condition — standard
    # in set-similarity joins, e.g. AllPairs): jaccard(A,B) >= t implies
    # t * max(|A|,|B|) <= min(|A|,|B|), so size-incompatible band
    # collisions are dropped INSIDE the join, before the candidate
    # dedup shuffle. On low-entropy corpora (small vocabularies where
    # most pairs are genuinely ~0.8-similar and the banding S-curve
    # cannot separate 0.8 from 0.95) this is the filter that keeps the
    # candidate set near the true-pair set instead of ~all-pairs x
    # bands. Never drops a true pair at any threshold.
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x._id") < F.col("y._id"))
            & (
                F.lit(threshold) * F.greatest(F.col("x.sz"), F.col("y.sz"))
                <= F.least(F.col("x.sz"), F.col("y.sz"))
            ),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .dropDuplicates()
    )
    # exact verify on the candidate set only (join keyed on
    # (id_b, shingle): bounded by |cand| x set size, not by shingle
    # document frequency)
    verified = _verify_jaccard(cand, rep_sh, threshold)
    set_pairs = (
        verified.join(
            members.select(F.col("_id").alias("id_a"), F.col("set_key").alias("k_a")),
            "id_a",
        )
        .join(
            members.select(F.col("_id").alias("id_b"), F.col("set_key").alias("k_b")),
            "id_b",
        )
        .select("k_a", "k_b", "jaccard")
    )
    return _expand_set_pairs(set_pairs, members, threshold)


# ---------------------------------------------------------------------------
# incremental near-dup (new batch vs a persisted corpus LSH index)
# ---------------------------------------------------------------------------


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    include_shingles: bool = True,
) -> DataFrame:
    """Persistable per-document LSH index over a corpus: one row per
    document — ``(id, set_key, sz, band_hashes array<long>[, shingles
    array<string>])``. Built ONCE and written as a table; incremental
    batches (:func:`incremental_near_dups`) join against it without
    ever touching corpus text again. Band fan-out happens at query
    time in-plan, so storage is one row per doc, not per band.
    ``set_key`` uses the same md5-over-sorted-set identity as
    :func:`_set_groups`.

    Two storage tiers:

    * ``include_shingles=True`` (default): the distinct shingle set
      rides the index, so even the exact verify is index-only — right
      when the index (a small fraction of corpus bytes) is cheap to
      hold;
    * ``include_shingles=False``: signatures only (~KB/doc ->
      ~100 B/doc) — at 10^10 docs the full-shingle index is itself a
      multi-TB table, so this tier keeps it signature-sized and
      :func:`incremental_near_dups` re-reads corpus TEXT for exactly
      the candidate documents that survive the band join + size prune
      (pass ``corpus=``)."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sh = _shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    per_doc = sh.groupBy("_id").agg(
        F.sort_array(F.collect_set("shingle")).alias("shingles"), *aggs
    )
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"h{b * rows + r}") for r in range(rows)])
        for b in range(bands)
    ]
    cols = [
        F.col("_id").alias(id_col),
        F.md5(F.concat_ws("\x00", "shingles")).alias("set_key"),
        F.size("shingles").cast("long").alias("sz"),
        F.array(*band_cols).alias("band_hashes"),
    ]
    if include_shingles:
        cols.append(F.col("shingles"))
    return per_doc.select(*cols)


def incremental_near_dups(
    batch: DataFrame,
    index: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Near-dups of a NEW document batch against an existing corpus
    index (:func:`minhash_index`) — the daily-increment pipeline shape.
    Returns ``(id_new, id_corpus, jaccard)``, exact at the threshold
    (banding prunes, ``array_intersect`` over the shingle sets
    verifies). ``num_perm``/``bands``/``shingle_n`` must match the
    index build.

    With a full index (shingle sets carried) the corpus is never
    re-read — only index tables are joined. With a signatures-only
    index (``minhash_index(include_shingles=False)``) pass the corpus
    table as ``corpus=``: the verify re-shingles exactly ONE
    representative document per candidate set_key that survives the
    band join + size prune — at 10^10 docs the index stays
    signature-sized and the corpus rescan is bounded by the candidate
    count, not the corpus.

    Both sides collapse to distinct shingle sets before the band join
    (boilerplate-heavy corpora cost output expansion, not join size);
    the size-compatibility condition ``t*max(sz) <= min(sz)`` prunes
    inside the join; candidate dedup shuffles only the two 128-bit set
    keys, with the shingle arrays joined back for the verify."""
    has_shingles = "shingles" in index.columns
    if not has_shingles and corpus is None:
        raise ValueError(
            "signatures-only index (no shingles column) requires corpus= "
            "for the verify join-back"
        )
    bidx = minhash_index(batch, id_col, text_col, num_perm, bands, shingle_n)
    b_sets = bidx.dropDuplicates(["set_key"]).select(
        F.col("set_key").alias("k_new"),
        F.col("sz").alias("sz_new"),
        "band_hashes",
        F.col("shingles").alias("sh_new"),
    )
    c_rep = index.dropDuplicates(["set_key"])
    c_sets = c_rep.select(
        F.col("set_key").alias("k_corp"),
        F.col("sz").alias("sz_corp"),
        "band_hashes",
        *([F.col("shingles").alias("sh_corp")] if has_shingles else []),
    )
    xb = b_sets.select("k_new", "sz_new", F.explode("band_hashes").alias("bh"))
    xc = c_sets.select("k_corp", "sz_corp", F.explode("band_hashes").alias("bh"))
    cand = (
        xb.join(
            xc,
            (xb["bh"] == xc["bh"])
            & (
                F.lit(threshold) * F.greatest("sz_new", "sz_corp")
                <= F.least("sz_new", "sz_corp")
            ),
        )
        .select("k_new", "k_corp")
        .dropDuplicates()
    )
    if has_shingles:
        corp_side = c_sets.select("k_corp", "sz_corp", "sh_corp")
    else:
        # one representative doc per surviving candidate set_key is
        # re-shingled from corpus text (identical normalization to the
        # index build, so set identity is preserved)
        rep = (
            c_rep.select(
                F.col("set_key").alias("k_corp"), F.col(id_col).alias("_rid")
            )
            .join(cand.select("k_corp").dropDuplicates(), "k_corp")
        )
        rep_docs = corpus.join(
            rep.select(F.col("_rid").alias(id_col)).dropDuplicates(), id_col
        )
        sh_rep = _shingles(rep_docs, id_col, text_col, shingle_n).groupBy("_id").agg(
            F.sort_array(F.collect_set("shingle")).alias("sh_corp")
        )
        corp_side = (
            rep.join(sh_rep, rep["_rid"] == sh_rep["_id"])
            .select("k_corp", "sh_corp")
            .join(c_sets.select("k_corp", "sz_corp"), "k_corp")
        )
    inter = F.size(F.array_intersect("sh_new", "sh_corp"))
    jac = F.round(
        F.try_divide(inter, F.col("sz_new") + F.col("sz_corp") - inter), 4
    )
    set_pairs = (
        cand.join(b_sets.select("k_new", "sz_new", "sh_new"), "k_new")
        .join(corp_side, "k_corp")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("k_new", "k_corp", "jaccard")
    )
    return (
        set_pairs.join(
            bidx.select(F.col(id_col).alias("id_new"), F.col("set_key").alias("k_new")),
            "k_new",
        )
        .join(
            index.select(
                F.col(id_col).alias("id_corpus"), F.col("set_key").alias("k_corp")
            ),
            "k_corp",
        )
        .select("id_new", "id_corpus", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(_id, simhash long): 64-bit simhash over word-unigram xxhash64
    values — computed entirely JVM-side: explode tokens, per-bit sign
    sums via bitwise ops, reassemble."""
    tok = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.length("tok") > 0)
        .withColumn("h", F.xxhash64("tok"))
    )
    # per-bit +1/-1 contributions: shiftright then &1 -> {0,1} -> 2x-1
    bit_aggs = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("_id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
    return agg.select("_id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= k, via the
    pigeonhole banding trick: split 64 bits into k+1 bands; any pair
    within distance k agrees on >= 1 band exactly."""
    sims = simhash(df, id_col, text_col)
    n_bands = max_hamming + 1
    width = 64 // n_bands
    band_cols = [
        F.shiftrightunsigned(F.col("simhash"), b * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sims.select("_id", "simhash", *band_cols)
    pairs = None
    for b in range(n_bands):
        x = banded.select(
            F.col("_id").alias("id_a"), F.col("simhash").alias("sim_a"), F.col(f"band{b}").alias("bk")
        )
        y = banded.select(
            F.col("_id").alias("id_b"), F.col("simhash").alias("sim_b"), F.col(f"band{b}").alias("bk")
        )
        p = x.join(y, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_md5(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(_id, simhash long): 60-bit simhash over DISTINCT word unigrams
    with an md5-derived token hash (first 15 hex digits as an integer).
    Slower than the xxhash64 variant but exactly reproducible in ANSI
    SQL — this is the cross-engine-checkable simhash."""
    tok = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
        )
        .where(F.length("tok") > 0)
        .withColumn("h", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"))
    )
    bit_aggs = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
        for i in range(60)
    ]
    agg = tok.groupBy("_id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(60):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("_id", sim.alias("simhash"))


def simhash_md5_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with md5-simhash hamming <= k via the pigeonhole
    banding trick (k+1 bands over 60 bits): (id_a, id_b, hamming)."""
    sims = simhash_md5(df, id_col, text_col)
    n_bands = max_hamming + 1
    width = 60 // n_bands
    band_cols = [
        F.shiftrightunsigned(F.col("simhash"), b * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sims.select("_id", "simhash", *band_cols)
    pairs = None
    for b in range(n_bands):
        x = banded.select(
            F.col("_id").alias("id_a"), F.col("simhash").alias("sim_a"),
            F.col(f"band{b}").alias("bk"),
        )
        y = banded.select(
            F.col("_id").alias("id_b"), F.col("simhash").alias("sim_b"),
            F.col(f"band{b}").alias("bk"),
        )
        p = x.join(y, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# duplicate n-gram span detection (substring-level dedup)
# ---------------------------------------------------------------------------


def dup_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated token spans at n-gram resolution.

    The distributed stand-in for suffix-array substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): any token run of length >= ``n`` shared with another
    document is covered by shared positional n-grams, so marking every
    position whose n-gram occurs in >= ``min_docs`` *distinct*
    documents and merging overlapping ``[pos, pos+n)`` windows per
    document recovers the maximal cross-document duplicated spans at
    n-token resolution (within-document repeats alone do not trigger).

    All JVM-side, two exchanges, ONE gram scan, no Python:

    1. tokenize + positional n-grams in one projection — ``transform``
       over ``sequence(0, len-n)``; the shuffle key is ``md5`` of the
       gram (32 bytes), never the text, so at 10^10 docs the gram
       exchange moves hashes, not corpus bytes (md5 is kept so the
       DuckDB oracle shares the key bit-for-bit; a production
       deployment would swap in ``xxhash64`` — one line — for a
       cheaper hash and an 8-byte key);
    2. the distinct-doc frequency test is a WINDOW over the single
       gram exchange, not a groupBy + self-join back (the r4 shape —
       it recomputed the whole gram projection on both branches and
       cost a third exchange): per row, ``dense_rank`` over
       ``(gram_key, _id)`` then ``max(rank)`` over the gram partition
       IS the gram's distinct-doc count, so one sorted pass marks
       every duplicated position. A pathological mega-gram (one exact
       n-gram shared by ~all documents) lands in one window partition
       — WindowExec buffers spill to disk rather than OOM, and the
       md5 key otherwise spreads uniformly;
    3. one ``Window.partitionBy(doc)`` island merge — the second and
       last exchange.

    Returns ``(doc_id, span_start, span_end, span_tokens)`` with
    ``span_end`` exclusive, all counts BIGINT.
    """
    grams = positional_ngrams(df, id_col, text_col, n)
    wg_ord = Window.partitionBy("gram_key").orderBy("_id")
    wg_all = Window.partitionBy("gram_key")
    hits = (
        grams.withColumn("_rk", F.dense_rank().over(wg_ord))
        .withColumn("_docs", F.max("_rk").over(wg_all))
        .filter(F.col("_docs") >= min_docs)
        .select("_id", "pos")
    )
    return merge_islands(hits, n, id_col)


def positional_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, pos, gram_key): every positional word n-gram of every
    document, keyed by md5 of the space-joined gram — one projection,
    no shuffle (shared by :func:`dup_ngram_spans` and
    :func:`walker_spark.operators.curation.contamination_spans`)."""
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_t")).filter(
        F.size("_t") >= n
    )
    return base.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.encode(F.concat_ws(" ", F.slice("_t", i + 1, n)), "UTF-8")
                    ).alias("gram_key"),
                ),
            )
        ).alias("_g"),
    ).select("_id", F.col("_g.pos").alias("pos"), F.col("_g.gram_key").alias("gram_key"))


def merge_islands(hits: DataFrame, n: int, id_col: str) -> DataFrame:
    """Merge marked positions ``(_id, pos)`` into maximal spans of
    overlapping ``[pos, pos+n)`` windows per document — one window
    exchange on the doc id. Returns ``(id_col, span_start, span_end,
    span_tokens)``, span_end exclusive, BIGINT."""
    w = Window.partitionBy("_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "_new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    )
    islands = marked.withColumn("_isl", F.sum("_new").over(w))
    return (
        islands.groupBy("_id", "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-line removal (the CCNet / RefinedWeb
    boilerplate pass): a line whose whitespace-normalized lower-cased
    form occurs in >= ``min_docs`` DISTINCT documents is boilerplate
    (nav bars, cookie banners, footers), and EVERY occurrence of it is
    cut from every document; surviving lines are re-joined in original
    order. Finer-grained than doc-level dedup (the rest of this module)
    and coarser than token-span dedup (:func:`dup_ngram_spans`) — real
    pipelines run all three.

    Semantics: documents split on ``\\n``; lines that normalize to
    empty are dropped unconditionally; within-document repeats alone do
    not trigger (the count is distinct *documents*, same contract as
    ``dup_ngram_spans``). Returns ONE row per input document:
    ``(id_col, n_lines, n_kept, clean_text)`` — ``n_lines`` counts
    non-empty lines, ``clean_text`` is '' when everything was cut.

    Scale shape (10^10 docs): the line text crosses the wire exactly
    twice — once hashpartitioned on the 32-byte md5 line key (the
    distinct-doc test is dense_rank + max over that single exchange,
    the r5 ``dup_ngram_spans`` pattern — no groupBy + join-back, which
    would either re-shuffle the text or need an unbounded broadcast of
    the dup-key set), and once on the doc id for reconstruction. A
    pathological mega-line (one banner in ~every doc) lands in one
    window partition: WindowExec buffers spill to disk rather than
    OOM. The final left join is id-only (8-byte rows) and reuses the
    reconstruction exchange's partitioning on the agg side.
    """
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("_norm", normalized_text(F.col("line")))
        .filter(F.length("_norm") > 0)
        .withColumn("line_key", F.md5(F.encode("_norm", "UTF-8")))
        .drop("_norm")
    )
    wk_ord = Window.partitionBy("line_key").orderBy("_id")
    wk_all = Window.partitionBy("line_key")
    flagged = (
        lines.withColumn("_rk", F.dense_rank().over(wk_ord))
        .withColumn("_docs", F.max("_rk").over(wk_all))
        .withColumn("keep", F.col("_docs") < min_docs)
    )
    kept_struct = F.when(F.col("keep"), F.struct("pos", "line"))
    aggs = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    return base.join(aggs, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over a pair graph)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    algorithm: str = "two_phase",
) -> DataFrame:
    """(doc_id, cluster_id) for every node of the near-dup pair graph;
    ``cluster_id`` is the minimum doc id in the node's connected
    component — the canonical "keeper" every dedup pipeline needs after
    pair generation (drop all rows where doc_id != cluster_id).

    Default algorithm: alternating large-star/small-star (Kiveris et
    al. 2014, "Connected Components in MapReduce and Beyond" — the
    two-phase variant). Each round rewires the EDGE set toward a star
    forest centered at component minimums:

    * large-star — per node u over its bidirectional neighborhood,
      connect every larger neighbor to ``m = min(N(u) ∪ {u})``;
    * small-star — per node u over its smaller neighbors, connect them
      (and u) to their minimum.

    Both are a single window over one hash exchange (no joins, no
    separate label table), one ``localCheckpoint`` per round with the
    edge-set fingerprint (count + hash sum) riding it as an
    Observation — one Spark job per round. Convergence = fingerprint
    unchanged, then confirmed EXACTLY by the star-forest invariant
    (every node appears on one side only, one center per leaf) before
    returning, so a hash collision can never smuggle out wrong labels;
    on confirmation the final edges ARE the labels (leaf → component
    min). Rounds are O(log² n) worst-case and a small constant on
    near-dup graphs; each round is a cluster-wide barrier at 10^10
    edges, so round count — recorded per run in
    ``connected_components.last_rounds`` — is the scale-relevant cost.

    ``algorithm="label_prop"`` keeps the r3 min-label propagation +
    pointer jumping loop (parity-tested); per-round it pays two hash
    joins plus a groupBy and historically needed ~2x the rounds on the
    bench graph."""
    if algorithm == "two_phase":
        return _cc_two_phase(pairs, id_a, id_b, max_iterations)
    if algorithm != "label_prop":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        nbr_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        jump = labels.select(F.col("node").alias("j_node"), F.col("lbl").alias("j_lbl"))
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .join(jump, labels["lbl"] == jump["j_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nlbl"), F.col("lbl")),
                    F.coalesce(F.col("j_lbl"), F.col("lbl")),
                ).alias("lbl"),
                (F.col("lbl") != F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nlbl"), F.col("lbl")),
                    F.coalesce(F.col("j_lbl"), F.col("lbl")),
                )).alias("_changed"),
            )
        )
        from pyspark.sql import Observation

        obs = Observation()
        new_labels = new_labels.observe(
            obs, F.coalesce(F.sum(F.col("_changed").cast("long")), F.lit(0)).alias("changed")
        ).localCheckpoint()
        changed = obs.get["changed"]
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        # Partially-propagated labels are silently-wrong cluster ids
        # (and a wrong is_keeper downstream) — fail loudly instead.
        # Unreachable at realistic diameters: pointer jumping converges
        # in O(log diameter) rounds.
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"{max_iterations} iterations; raise max_iterations"
        )
    connected_components.last_rounds = rounds
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def _cc_two_phase(
    pairs: DataFrame, id_a: str, id_b: str, max_iterations: int
) -> DataFrame:
    """Alternating large-star/small-star rounds until the edge set is a
    star forest; see :func:`connected_components` for the contract."""
    from pyspark.sql import Observation

    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # canonical orientation (u > v); self-pairs carry no information
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    fp = None  # (edge count, xxhash64 sum) fingerprint of the edge set
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # ---- large-star: every v > u links to min(N(u) ∪ {u}) -------
        bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        wl = Window.partitionBy("u")
        large = (
            bidir.withColumn("m", F.least(F.min("v").over(wl), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # large-star output is already (bigger, smaller): m <= u < v
        # ---- small-star: smaller neighbors (and u) link to their min;
        # the group row carrying (u, m) rides row_number()==1 so the
        # large-star output is consumed exactly once (no self-union)
        ws = Window.partitionBy("u")
        wr = Window.partitionBy("u").orderBy("v")
        small = (
            large.select(
                "u",
                "v",
                F.min("v").over(ws).alias("m"),
                F.row_number().over(wr).alias("_rn"),
            )
            .select(
                F.explode(
                    F.when(
                        F.col("_rn") == 1,
                        F.array(
                            F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                            F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                        ),
                    ).otherwise(
                        F.array(F.struct(F.col("v").alias("a"), F.col("m").alias("b")))
                    )
                ).alias("_e")
            )
            .select(F.col("_e.a").alias("u"), F.col("_e.b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        obs = Observation()
        edges = small.observe(
            obs,
            F.count(F.lit(1)).alias("cnt"),
            # decimal sum: ANSI mode long-overflows on summed hashes
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("hs"),
        ).localCheckpoint()
        new_fp = (obs.get["cnt"], obs.get["hs"])
        if new_fp == fp:
            # exact star-forest confirmation (a 64-bit fingerprint
            # collision must never smuggle out partial labels): every
            # leaf has exactly one center, and no center is a leaf
            multi_center = edges.groupBy("u").count().filter(F.col("count") > 1)
            if multi_center.isEmpty() and edges.select("u").intersect(
                edges.select("v")
            ).isEmpty():
                break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"{max_iterations} iterations; raise max_iterations"
        )
    connected_components.last_rounds = rounds
    # star forest: edges ARE the labels (leaf -> component minimum);
    # centers and isolated nodes label themselves
    leaves = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    selfs = nodes.join(
        edges.select(F.col("u").alias("node")), "node", "left_anti"
    ).select(F.col("node").alias("doc_id"), F.col("node").alias("cluster_id"))
    return leaves.union(selfs)


def near_dup_clusters(
    df: DataFrame | None = None,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
    pairs: DataFrame | None = None,
    include_singletons: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH pairs at
    ``threshold`` -> connected components -> (doc_id, cluster_id,
    is_keeper). Keeper = the minimum doc id of each cluster (the
    deterministic survivor a dedup pass keeps).

    ``pairs``: a precomputed (id_a, id_b, ...) near-dup pair DataFrame
    — pass it when an upstream stage already ran the LSH join (a real
    pipeline materializes pairs once and reuses them; recomputing the
    banded join inside clustering doubles the dominant cost).

    Output covers only nodes of the pair graph by default — documents
    with no near-dup are absent. To drop dups, LEFT join documents to
    this result and keep rows where ``coalesce(is_keeper, true)`` (a
    missing row means the document is its own keeper); an inner join +
    ``doc_id == cluster_id`` would silently discard the entire
    dup-free majority of a real corpus. Or pass
    ``include_singletons=True`` (requires ``df``) to emit every
    document as its own keeper row."""
    if pairs is None:
        if df is None:
            raise ValueError("near_dup_clusters needs df or pairs")
        pairs = minhash_lsh_pairs(
            df, threshold=threshold, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n, **lsh_kwargs,
        )
    comps = connected_components(pairs)
    if include_singletons:
        if df is None:
            raise ValueError("include_singletons=True requires df")
        ids = df.select(F.col(id_col).alias("doc_id")).distinct()
        comps = ids.join(comps, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    return comps.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def semantic_dup_pairs(
    df: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.95,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pairs via k-means-cell blocking — partition the
    corpus into inverted cells (deterministic codebook + optional
    Lloyd refinement, shared with similarity.ivf_topk), then compute
    pairwise cosine WITHIN cells only. Unlike
    :func:`embedding_dup_pairs` this needs no pre-existing label
    column: the blocking is learned from the embeddings themselves,
    which is what makes the quadratic join tractable at 10^8+ vectors.

    Scale shape: the codebook is KB-sized driver state by design (it
    IS the index — same contract as ivf_topk); assignment is one
    narrow map (no shuffle); the only exchange is the cell join, and
    per-cell pair counts bound the quadratic term — size ``n_centroids
    ~ sqrt(n)`` so cells stay ~constant. Pairs whose members land in
    different cells are missed: that is SemDeDup's documented
    approximation (recall is bought back with ``refine_iters`` making
    cells tighter). ``refine_iters=0`` keeps every step deterministic
    arithmetic over data + literals, so a SQL oracle replays it
    exactly. Returns ``(id_a, id_b, cosine)`` rounded to 3 (the
    cross-engine-stable precision). One survivor per semantic group =
    ``near_dup_clusters(df, pairs=semantic_dup_pairs(df, ...))``.
    """
    from walker_spark.operators.similarity import (
        ivf_assign,
        ivf_refine_centroids,
        ivf_sample_centroids,
    )

    centroids = ivf_sample_centroids(df, n_centroids, id_col, vec_col)
    if refine_iters:
        centroids = ivf_refine_centroids(df, centroids, refine_iters, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col, vec_col).select(
        F.col("id").alias(id_col), "cid"
    )
    cells = df.select(id_col, vec_col).join(assigned, id_col)
    return embedding_dup_pairs(
        cells, threshold=threshold, id_col=id_col, vec_col=vec_col,
        bucket_col_name="cid",
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col_name: str | None = "label",
) -> DataFrame:
    """Pairs with cosine similarity >= threshold. A blocking column
    (e.g. a cluster/label or an LSH bucket from similarity.py) bounds
    the quadratic join; pass None for the full cross join (small n
    ONLY — warns, because at corpus scale an unblocked join is O(n^2);
    derive a bucket with similarity.hyperplane_buckets first)."""
    if bucket_col_name is None:
        import warnings

        warnings.warn(
            "embedding_dup_pairs without a blocking column is a full "
            "cross join — O(n^2) pairs; block on a label or LSH bucket "
            "(similarity.py) for anything beyond ~10^4 vectors",
            stacklevel=2,
        )
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        *( [F.col(bucket_col_name).alias("_bk")] if bucket_col_name else [F.lit(0).alias("_bk")] ),
    ).withColumn("nrm", _norm(F.col("vec")))
    a = v.select(F.col("_id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"), "_bk")
    b = v.select(F.col("_id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"), "_bk")
    return (
        a.join(b, "_bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(F.try_divide(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")), 3),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs (PassJoin pigeonhole blocking)
# ---------------------------------------------------------------------------


def edit_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edit: int = 2,
) -> DataFrame:
    """All unordered pairs of SHORT strings (titles, URLs, product
    names) within Levenshtein distance ``max_edit`` — exact recall via
    PassJoin partitioning (Li, Deng, Feng & Wang, VLDB 2011): a string
    of length ``ls`` splits into ``d+1`` contiguous chunks, and by
    pigeonhole any string within edit distance ``d`` contains at least
    one chunk VERBATIM within ``d`` positions of its home offset — so
    the candidate space is an equi-join on ``(chunk_idx, source_len,
    substring)`` keys instead of all pairs. Verification is the
    engine-native ``levenshtein`` (DuckDB has the identical function,
    so the oracle is exact).

    Shapes: the index side emits ``d+1`` keys per string; the probe
    side enumerates (length window 2d+1) x (d+1 chunks) x (position
    shift 2d+1) substrings in the scan task — a constant ~75 keys at
    d=2, filtered to valid offsets. ONE hash equi-join on the key,
    distinct pair set, then one codegen levenshtein per surviving
    candidate. Texts ride the keys (strings are short by contract —
    gate long text upstream; for documents use the shingle family).

    Returns ``(id_a, id_b, dist)``, ``id_a < id_b``, dist <= d.
    Contract edge: a pair where BOTH strings are shorter than ``d+1``
    characters is not reported (neither side can host d+1 non-empty
    chunks; such strings are trivially all within distance d of each
    other — filter them upstream if they matter)."""
    d = max_edit
    if d < 1:
        raise ValueError(f"max_edit must be >= 1: {d}")
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.length(text_col).cast("int").alias("ln"),
    )

    # chunk i of a length-ls string: base = ls div (d+1), the last
    # (ls % (d+1)) chunks are one longer; start is 1-based for substring
    def chunk_len(ls, i):
        return f"(({ls}) div {d + 1} + (CASE WHEN {i} >= {d + 1} - ({ls}) % {d + 1} THEN 1 ELSE 0 END))"

    def chunk_start(ls, i):
        return (
            f"({i} * (({ls}) div {d + 1})"
            f" + greatest(0, {i} - ({d + 1} - ({ls}) % {d + 1})) + 1)"
        )

    idx_keys = F.array(
        *[
            F.expr(
                f"struct({i} AS ci, ln AS ls, "
                f"substring(t, {chunk_start('ln', i)}, {chunk_len('ln', i)}) AS sub)"
            )
            for i in range(d + 1)
        ]
    )
    idx = s.filter(F.col("ln") > d).select(
        "id", "t", F.explode(idx_keys).alias("k")
    ).select("id", "t", "k.ci", "k.ls", "k.sub")

    probe_structs = []
    for dl in range(-d, d + 1):  # candidate source length = ln + dl
        for i in range(d + 1):
            for sh in range(-d, d + 1):  # position shift
                ls = f"(ln + {dl})"
                start = f"({chunk_start(ls, i)} + {sh})"
                length = chunk_len(ls, i)
                probe_structs.append(
                    F.expr(
                        f"CASE WHEN {ls} > {d} AND {start} >= 1"
                        f" AND {start} + {length} - 1 <= ln AND {length} >= 1"
                        f" THEN struct({i} AS ci, {ls} AS ls,"
                        f" substring(t, {start}, {length}) AS sub)"
                        f" END"
                    )
                )
    probes = s.select(
        "id",
        "t",
        F.explode(
            F.array_distinct(
                F.filter(F.array(*probe_structs), lambda x: x.isNotNull())
            )
        ).alias("k"),
    ).select(
        F.col("id").alias("id_p"),
        F.col("t").alias("t_p"),
        "k.ci",
        "k.ls",
        "k.sub",
    )
    cand = (
        idx.join(probes, ["ci", "ls", "sub"])
        .filter(F.col("id") != F.col("id_p"))
        .select(
            F.least("id", "id_p").alias("id_a"),
            F.greatest("id", "id_p").alias("id_b"),
            F.when(F.col("id") < F.col("id_p"), F.col("t"))
            .otherwise(F.col("t_p"))
            .alias("t_a"),
            F.when(F.col("id") < F.col("id_p"), F.col("t_p"))
            .otherwise(F.col("t"))
            .alias("t_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.levenshtein("t_a", "t_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= d)


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (the Rabin/FastCDC family: cut where a
    rolling window's hash satisfies a mask, so chunk boundaries move
    WITH the content — an insertion re-chunks only its neighborhood,
    where fixed-size blocks would shift every downstream boundary).
    The dedup granularity between whole-doc exact dedup and
    dup_ngram_spans: identical boilerplate blocks shared across
    documents collapse to one stored chunk regardless of position.

    Returns one row per chunk: ``(id, chunk_idx, chunk_start, n_chars,
    chunk_key)`` — 1-based char offsets, ``chunk_key`` the md5 of the
    chunk text. A position ``i`` is a boundary when
    ``md5_u32(substr(text, i, window)) % divisor == 0`` (expected
    chunk length ~``divisor`` chars); the cut lands AFTER the window.
    No min/max clamp — the pure content-defined law, cross-engine
    exact.

    Scale shape: the ENTIRE derivation — positions, boundary filter,
    cut array, chunk fan-out — is array expressions inside one
    projection (cuts materialize as a real column first, so the
    O(len * window) md5 scan runs once — the language_id
    CollapseProject lesson): ZERO exchanges, text never shuffles;
    only (id, offsets, 32-byte keys) leave the scan. Downstream dedup
    aggregates on chunk_key with map-side partials."""
    from walker_spark.operators.sketches import _md5_u32

    if window < 1 or divisor < 2:
        raise ValueError(f"need window >= 1, divisor >= 2: {window}, {divisor}")
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        t.alias("_txt"),
        F.length(t).alias("_L"),
    ).filter(F.col("_L") > 0)
    positions = F.when(
        F.col("_L") > window, F.sequence(F.lit(1), F.col("_L") - window)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.concat(
        F.array(F.lit(1)),
        F.transform(
            F.filter(
                positions,
                lambda i: (_md5_u32(F.col("_txt").substr(i, F.lit(window))) % divisor)
                == 0,
            ),
            lambda i: i + window,
        ),
        F.array(F.col("_L") + 1),
    )
    staged = base.withColumn("_cuts", cuts)
    spans = F.transform(
        F.sequence(F.lit(0), F.size("_cuts") - 2),
        lambda j: F.struct(
            j.cast("long").alias("chunk_idx"),
            F.element_at(F.col("_cuts"), j + 1).alias("s"),
            F.element_at(F.col("_cuts"), j + 2).alias("e"),
        ),
    )
    return staged.select(
        "id", "_txt", F.explode(spans).alias("_c")
    ).select(
        "id",
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.s").cast("long").alias("chunk_start"),
        (F.col("_c.e") - F.col("_c.s")).cast("long").alias("n_chars"),
        F.md5(
            F.col("_txt").substr(F.col("_c.s"), F.col("_c.e") - F.col("_c.s"))
        ).alias("chunk_key"),
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Storage-dedup ratio over a :func:`cdc_chunks` table: ONE row
    ``(n_chunks, n_distinct_chunks, total_chars, distinct_chars,
    saved_chars)``, all BIGINT. Two-phase: per-key (copies, length)
    with map-side partials on the 32-byte key, then a scalar rollup —
    the exact accounting a chunk store's admission path keeps."""
    per_key = chunks.groupBy("chunk_key").agg(
        F.count(F.lit(1)).cast("long").alias("_copies"),
        F.min("n_chars").cast("long").alias("_n"),
    )
    return per_key.agg(
        F.sum("_copies").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("_copies") * F.col("_n")).cast("long").alias("total_chars"),
        F.sum("_n").cast("long").alias("distinct_chars"),
        (F.sum(F.col("_copies") * F.col("_n")) - F.sum("_n"))
        .cast("long")
        .alias("saved_chars"),
    )


def quality_keeper(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Re-pick each dup cluster's survivor by QUALITY instead of min
    id: keeper = the highest-scoring member, ties broken by minimum
    id. The selection every production dedup pass actually wants —
    near-dup clusters routinely mix a clean original with truncated
    or boilerplate-wrapped copies, and `min(doc_id)` keeps whichever
    was crawled first (RefinedWeb/FineWeb pipelines keep the longest
    or best-scored member for exactly this reason).

    Inputs: ``components`` (id, cluster) from
    :func:`connected_components` / :func:`near_dup_clusters`, and any
    per-doc ``scores`` frame (textstats quality/gopher/classifier
    outputs, or simply document length). Docs missing a score stay in
    the output but only win if their whole cluster is unscored (the
    null-safe filter below — ``<=>`` matches the all-null best), with
    the min-id tiebreak.

    Shape: two cluster-keyed aggregations (best score, then min id at
    best) and two joins back — every stage has map-side partials and
    the shuffle key is cluster_id, so a mega-cluster is a hot REDUCE
    key (partial-agg friendly), never a hot window partition; no
    negate-the-id struct-ordering trick, so ids and scores may be any
    orderable type. Output ``(doc_id, cluster_id, is_keeper)`` — the
    near_dup_clusters contract, drop rows where not is_keeper.
    """
    comp = components.select(
        F.col(id_col).alias("doc_id"), F.col(cluster_col).alias("cluster_id")
    )
    sc = scores.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("_score"))
    j = comp.join(sc, "doc_id", "left")
    best = j.groupBy("cluster_id").agg(F.max("_score").alias("_best"))
    keep = (
        j.join(best, "cluster_id")
        .filter(F.col("_score").eqNullSafe(F.col("_best")))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("_keeper"))
    )
    return comp.join(keep, "cluster_id").select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("_keeper")).alias("is_keeper"),
    )


def within_doc_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document repeated-line removal — the intra-page
    complement to the cross-document :func:`line_dedup` pass (real
    extraction pipelines run both: a nav block repeated down one page
    is noise even if no other document shares it; trafilatura and the
    CCNet line filters both special-case it). A line is cut iff an
    EARLIER line of the same document has the same
    whitespace-normalized lower-cased form; the first occurrence and
    all blank lines survive, original order preserved.

    Returns one row per document: ``(id_col, clean_text, n_lines,
    n_kept)`` with ``n_lines``/``n_kept`` counting non-blank lines
    BIGINT.

    Scale shape: ZERO exchange — the whole operator is one projection
    of array expressions (split → key transform → first-occurrence
    filter → re-join), so it composes into any scan without adding a
    stage; the per-doc work is bounded by line count squared
    (array_position scan), fine for page-sized documents and
    embarrassingly parallel at 10^10 docs. Cross-engine exact: the
    identical split/trim/lower/first-position algebra runs in DuckDB
    (1-based lambda index there, 0-based here — the oracle shifts)."""
    lines = F.split(F.col(text_col), "\n")
    keys = F.transform(lines, lambda x: F.trim(F.lower(x)))
    kept = F.filter(
        lines,
        lambda x, i: (F.length(F.trim(x)) == 0)
        | (F.array_position(keys, F.trim(F.lower(x))) == i + F.lit(1)),
    )
    nonblank = lambda arr: F.size(  # noqa: E731
        F.filter(arr, lambda x: F.length(F.trim(x)) > 0)
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        nonblank(lines).cast("long").alias("n_lines"),
        nonblank(kept).cast("long").alias("n_kept"),
    )


def mirror_candidates(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_shared: int = 2,
    containment_threshold_ppm: int = 300_000,
) -> DataFrame:
    """Mirror detection between groups (hosts, dumps, sources): two
    groups are mirror CANDIDATES when one contains a large fraction
    of the other's EXACT content — the crawl-forensics pass that
    catches a site mirrored under a second domain, or one dump
    re-packaging another, where gram-level overlap
    (``textstats.source_overlap``) is too soft a signal: mirrors
    share whole documents, not vocabulary.

    Containment, not Jaccard, is the headline metric (a small mirror
    inside a huge host still scores ~1e6; Jaccard would dilute it):

        containment_ppm = shared * 1e6 div least(n_a, n_b)

    Returns ``(group_a, group_b, n_a, n_b, shared, containment_ppm,
    jaccard_ppm)``, ``group_a < group_b``, all BIGINT; pairs below
    ``min_shared`` shared documents or the containment threshold are
    omitted (sparse contract).

    Scale shape (the source_overlap precedent on content keys): the
    corpus collapses to DISTINCT (group, 32-byte md5 content key)
    rows — text never shuffles; the pair stage is ONE key-keyed
    exchange that collects each key's (<= G) group set and explodes
    the pairs in place (no self-join, no second shuffle of the key
    table). A page shared by all G groups still costs G²/2 pair rows
    (the inherent worst case — cut universal boilerplate with
    ``line_dedup`` upstream if G is huge); group sizes broadcast onto
    the sparse pair matrix."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1: {min_shared}")
    keys = (
        df.select(
            F.col(group_col).alias("g"),
            _content_key(F.col(text_col)).alias("k"),
        )
        .distinct()
    )
    sizes = keys.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # pair generation WITHOUT a self-join: one key-keyed exchange
    # collects the (<= G) groups sharing each exact text, pairs
    # explode from the sorted array in place. A self-join here would
    # both re-derive the distinct key table for its second side and
    # shuffle it twice. (The size rollup above is the one remaining
    # second derivation — at index scale, persist `keys` first.)
    sets = (
        keys.groupBy("k")
        .agg(F.array_sort(F.collect_set("g")).alias("gs"))
        .filter(F.size("gs") > 1)
    )
    shared = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(gs, (x, i) ->"
                    " transform(slice(gs, i + 2, size(gs)),"
                    " y -> struct(x AS group_a, y AS group_b))))"
                )
            ).alias("p")
        )
        .select("p.group_a", "p.group_b")
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))),
            "group_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("g").alias("group_b"), F.col("n").alias("n_b"))),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "shared",
            F.expr("CAST(shared * 1000000 div least(n_a, n_b) AS BIGINT)").alias(
                "containment_ppm"
            ),
            F.expr(
                "CAST(shared * 1000000 div (n_a + n_b - shared) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("containment_ppm") >= containment_threshold_ppm)
        )
    )
