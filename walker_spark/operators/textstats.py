"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side (built-in expressions), deliberately DuckDB-expressible so
every operator carries an exact SQL oracle for the correctness gate.
Heuristics are deterministic and documented — the point is distributed
plumbing + reproducibility, not model quality.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Marker stopwords per language (tiny deterministic language ID).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"),
    "es": ("el", "la", "los", "y", "es", "una", "por", "para", "con", "del"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "as", "at", "by", "on", "or", "be")


def _marker_hits(text_col, words: tuple[str, ...]):
    """Number of distinct marker words present as whole words."""
    hits = F.lit(0)
    for w in words:
        hits = hits + F.when(F.lower(text_col).rlike(rf"\b{w}\b"), 1).otherwise(0)
    return hits


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, predicted_lang, lang_score): argmax over languages of
    distinct marker-word hits; ties broken by language code order;
    'und' when nothing matches.

    The regex hit counts are materialized ONCE into int columns in a
    first projection and the argmax/tie-break runs over those ints in
    a second — without the split, a downstream join can inline the
    when-chain and re-evaluate all 40 rlike's per branch (measured 9×
    slower inside grouped_percentiles' composed plan)."""
    hits = df.select(
        F.col(id_col).alias("id"),
        *[
            _marker_hits(F.col(text_col), ws).cast("int").alias(f"_h_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    cols = {lang: F.col(f"_h_{lang}") for lang in LANG_MARKERS}
    best_score = F.greatest(*cols.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(cols[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return hits.select(
        "id",
        pred.alias("predicted_lang"),
        best_score.cast("int").alias("lang_score"),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_words): whitespace tokens plus a
    BPE-ish subword proxy (runs of letters / digits / single other
    chars) — both countable in ANSI SQL."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    word_pieces = F.size(
        F.filter(
            F.split(F.lower(t), r"[^a-z0-9]+"),
            lambda s: F.length(s) > 0,
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        F.when(F.length(F.trim(t)) == 0, 0).otherwise(ws_tokens).cast("long").alias("n_tokens"),
        word_pieces.cast("long").alias("n_words"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, punct_ratio, stopword_hits, mean_word_len, quality):
    deterministic quality heuristics — punctuation density, English
    stopword presence, mean token length; quality = a bounded linear
    combination (rounded for oracle comparison)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double")
    punct_ratio = F.round(F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0), 4)
    stop_hits = _marker_hits(t, EN_STOPWORDS).cast("int")
    toks = F.filter(F.split(F.lower(t), r"[^a-z0-9]+"), lambda s: F.length(s) > 0)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s)
    )
    mean_word_len = F.round(
        F.when(F.size(toks) > 0, total_len.cast("double") / F.size(toks)).otherwise(0.0), 4
    )
    quality = F.round(
        F.least(
            F.lit(1.0),
            (stop_hits.cast("double") / 10.0) * 0.5
            + F.when((mean_word_len >= 3) & (mean_word_len <= 8), 0.3).otherwise(0.0)
            + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0),
        ),
        4,
    )
    return df.select(
        F.col(id_col).alias("id"),
        punct_ratio.alias("punct_ratio"),
        stop_hits.alias("stopword_hits"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality"),
    )


# PII patterns chosen from the Java-regex ∩ RE2 common subset so the
# same pattern strings run verbatim on Spark and DuckDB (no lookaround,
# no backreferences).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_email, n_ip, n_phone): replace emails, IPv4
    literals and international-format phone numbers with placeholder
    tokens, counting matches per document. Order matters (emails first:
    an address would otherwise partially match the phone/ip digit
    runs). All JVM-side regexp_replace / regexp_extract_all — one
    narrow projection, no shuffle; at 100 TB this runs inside the same
    whole-stage-codegen pass as the rest of the cleaning pipeline.
    Heuristic by design (like every regex PII pass): the point is the
    distributed plumbing and cross-engine determinism, not recall."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat, _tok in PII_PATTERNS
    }
    clean = t
    for _name, pat, tok in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tok)
    return df.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        counts["email"].cast("int").alias("n_email"),
        counts["ip"].cast("int").alias("n_ip"),
        counts["phone"].cast("int").alias("n_phone"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint): md5 of whitespace-normalized lower-cased text
    — the cross-engine-stable document fingerprint (the engine's own
    FNV-1/64 fingerprint lives in functions.fnv for walker parity)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.encode(norm, "UTF-8")).alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition quality signals (Gopher-style
    filters, Rae et al. 2021 Table A1): per document, the fraction of
    bigram positions taken by the single most frequent bigram
    (``top_bigram_frac`` — catches degenerate loops) and the fraction
    of trigram positions whose trigram occurs more than once in the
    same document (``dup_trigram_frac`` — catches boilerplate /
    template text). Token-weighted variants of the paper's
    character-weighted originals; deterministic and DuckDB-expressible.

    Plumbing: positional n-grams per row (``transform`` over
    ``sequence``), then two aggregations keyed on (doc, gram) — the
    keys are per-document, so the shuffle distributes perfectly and no
    single task ever sees more than one document's grams. All
    JVM-side; fractions are ``try_divide`` (ANSI-safe) rounded to 4.
    """
    from walker_spark.operators.dedup import tokens

    base = df.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t"))

    def grams(k: int):
        return F.when(
            F.size("_t") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - k),
                lambda i: F.concat_ws(" ", F.slice("_t", i + 1, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def per_doc(k: int, agg_cols):
        counts = (
            base.select("_id", F.explode(grams(k)).alias("_g"))
            .groupBy("_id", "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        return counts.groupBy("_id").agg(*agg_cols)

    bi = per_doc(
        2,
        [
            F.sum("_c").cast("long").alias("n_bigrams"),
            F.max("_c").cast("long").alias("top_bigram_count"),
        ],
    )
    tri = per_doc(
        3,
        [
            F.sum("_c").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("dup_trigram_positions"),
        ],
    )
    return (
        base.select("_id")
        .join(bi, "_id", "left")
        .join(tri, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.round(
                F.coalesce(
                    F.try_divide("top_bigram_count", "n_bigrams"), F.lit(0.0)
                ),
                4,
            ).alias("top_bigram_frac"),
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("dup_trigram_positions", F.lit(0)).alias(
                "dup_trigram_positions"
            ),
            F.round(
                F.coalesce(
                    F.try_divide("dup_trigram_positions", "n_trigrams"), F.lit(0.0)
                ),
                4,
            ).alias("dup_trigram_frac"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    filter corpora by LM perplexity against a clean reference): train a
    Laplace-smoothed bigram LM on ``reference`` (two groupBy count
    passes), then score every document by its average per-token
    log-probability:

        avg_logprob = (1/(n-1)) * sum ln((C(w_{i-1},w_i)+1)/(C(w_{i-1})+V))

    with V = reference vocabulary size (Laplace over V; OOV history
    backs off to the uniform 1/V mass). Deterministic stand-in for the
    paper's KenLM 5-gram — the point is the distributed plumbing:
    counts tables join against exploded document bigrams (shuffle keys
    are single tokens / token pairs, AQE absorbs stopword skew), the
    vocabulary size rides the plan as a broadcast scalar, and no
    Python runs anywhere.

    Returns ``(id, n_bigrams BIGINT, avg_logprob DOUBLE round 3)``;
    documents with <2 tokens score 0.0 over 0 bigrams.
    """
    from walker_spark.operators.dedup import tokens

    ref_uni = (
        reference.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = ref_uni.agg(F.count(F.lit(1)).cast("double").alias("_V"))

    def bigrams(df, with_id: bool):
        t = tokens(F.col(text_col))
        base = df.select(
            *([F.col(id_col).alias("_id")] if with_id else []),
            t.alias("_t"),
        ).filter(F.size("_t") >= 2)
        return base.select(
            *(["_id"] if with_id else []),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - 2),
                    lambda i: F.struct(
                        F.element_at("_t", i + 1).alias("w1"),
                        F.element_at("_t", i + 2).alias("w2"),
                    ),
                )
            ).alias("_b"),
        ).select(*(["_id"] if with_id else []), "_b.w1", "_b.w2")

    ref_bi = bigrams(reference, with_id=False).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    doc_bi = bigrams(docs, with_id=True)
    scored = (
        doc_bi.join(ref_uni.withColumnRenamed("w", "w1"), "w1", "left")
        .join(ref_bi, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("_V"))
            ).alias("_lp"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("_lp"), 3).alias("avg_logprob"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias("id"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


# The eight stopwords Gopher (Rae et al. 2021, Table A1) requires at
# least two of; documents missing them are overwhelmingly boilerplate.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Composite Gopher document-quality filter (Rae et al. 2021,
    Table A1): the standard pre-training repetition/boilerplate gate,
    emitting every rule input plus the final verdict so downstream
    stages can re-threshold without recomputing:

    (id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, stop_hits, gopher_pass)

    Rules (all must hold for ``gopher_pass``): word count in
    [min_words, max_words]; mean word length in [3, 10]; '#'/ellipsis
    symbol-to-word ratio <= 0.1; <= 90% of lines bullet-started;
    <= 30% of lines ellipsis-ended; >= 80% of words containing a
    letter; >= ``min_stop_hits`` (Gopher: 2) of the eight required
    stopwords present as tokens.

    Pure narrow projection — higher-order array functions over the
    whitespace tokenization and the line split, zero Python, zero
    shuffle: at 100 TB this fuses into the same whole-stage-codegen
    scan as the rest of the cleaning pass. Ratios round(4) on both
    engines (oracle `gopher_rules`)."""
    t = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(t), r"\s+", " ")), " "),
        lambda s: F.length(s) > 0,
    )
    n_words = F.size(toks).cast("long")
    mean_word_len = F.round(
        F.when(
            n_words > 0,
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s))
            .cast("double")
            / n_words,
        ).otherwise(0.0),
        4,
    )
    # non-overlapping leftmost counts, identical in Spark and DuckDB
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = F.floor((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3)
    n_uni = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    symbol_ratio = F.round(
        F.when(n_words > 0, (n_hash + n_dots + n_uni).cast("double") / n_words).otherwise(
            0.0
        ),
        4,
    )
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    is_bullet = lambda x: (  # noqa: E731
        F.startswith(F.trim(x), F.lit("-"))
        | F.startswith(F.trim(x), F.lit("*"))
        | F.startswith(F.trim(x), F.lit("•"))
    )
    is_ellipsis = lambda x: F.endswith(F.trim(x), F.lit("...")) | F.endswith(  # noqa: E731
        F.trim(x), F.lit("…")
    )
    bullet_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(F.filter(lines, is_bullet)).cast("double") / n_lines,
        ).otherwise(0.0),
        4,
    )
    ellipsis_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(F.filter(lines, is_ellipsis)).cast("double") / n_lines,
        ).otherwise(0.0),
        4,
    )
    alpha_frac = F.round(
        F.when(
            n_words > 0,
            F.size(F.filter(toks, lambda s: s.rlike("[a-z]"))).cast("double") / n_words,
        ).otherwise(0.0),
        4,
    )
    stop_hits = F.lit(0)
    for w in GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.when(F.array_contains(toks, w), 1).otherwise(0)
    stop_hits = stop_hits.cast("int")
    out = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in passthrough],
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("stop_hits") >= min_stop_hits),
    )


# Phrases whose presence drops the whole page in C4 (Raffel et al.
# 2020 §2.2: "lorem ipsum" placeholder text and boilerplate policy
# notices).
C4_BAD_PHRASES: tuple[str, ...] = (
    "lorem ipsum",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
)

C4_LINE_TERMINALS: tuple[str, ...] = (".", "!", "?", '"')


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning pass (Raffel et al. 2020, §2.2 — the heuristics that
    produced the C4 pre-training corpus), line-level filter plus
    document verdict in one pass:

    line kept iff it ends in a terminal punctuation mark (., !, ?, "),
    has >= ``min_line_words`` words, and does not mention "javascript";
    document passes iff it contains no curly brace (code), none of the
    ``C4_BAD_PHRASES`` (placeholder text / policy boilerplate), and its
    kept lines carry >= ``min_sentences`` sentence terminators.

    Returns (id, n_lines, n_kept_lines, n_sentences, has_brace,
    has_bad_phrase, clean_text, c4_pass). Like ``gopher_rules`` this is
    a pure narrow projection — higher-order array functions over the
    line split, zero Python, zero shuffle — so at 100 TB it fuses into
    the same whole-stage-codegen scan as the rest of the cleaning
    pipeline, and every rule input is emitted so downstream stages can
    re-threshold without recomputing."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)

    def line_ok(x):
        xt = F.trim(x)
        low = F.lower(xt)
        words = F.filter(F.split(low, r"\s+"), lambda w: F.length(w) > 0)
        end_ok = F.lit(False)
        for term in C4_LINE_TERMINALS:
            end_ok = end_ok | F.endswith(xt, F.lit(term))
        return (
            end_ok
            & (F.size(words) >= min_line_words)
            & ~F.contains(low, F.lit("javascript"))
        )

    kept = F.filter(lines, line_ok)
    clean = F.concat_ws("\n", kept)

    def n_char(col, ch: str):
        return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))

    n_sentences = (n_char(clean, ".") + n_char(clean, "!") + n_char(clean, "?")).cast(
        "int"
    )
    low_t = F.lower(t)
    has_bad = F.lit(False)
    for p in C4_BAD_PHRASES:
        has_bad = has_bad | F.contains(low_t, F.lit(p))
    out = df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        F.contains(t, F.lit("{")).alias("has_brace"),
        has_bad.alias("has_bad_phrase"),
        clean.alias("clean_text"),
    )
    return out.withColumn(
        "c4_pass",
        ~F.col("has_brace")
        & ~F.col("has_bad_phrase")
        & (F.col("n_sentences") >= min_sentences),
    )


def hash_classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    seed: str = "qc1",
    weights: DataFrame | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """FastText-style hashed linear quality classifier (Joulin et al.
    2017; the CCNet / GPT-3 quality-filter shape: a linear model over
    hashed bag-of-words features). Each token hashes to one of ``dim``
    buckets; the document logit is the mean bucket weight; the score is
    the logistic of the logit.

    Default path (``weights=None``): bucket weights are deterministic
    pseudo-random INTEGERS in [-1000, 1000] derived from
    md5(seed:bucket), so the per-document sum is an exact int64 — no
    floating-point accumulation order anywhere, bit-identical on any
    partitioning and in the DuckDB oracle. logit = sum / (1000 * n),
    emitted at 4 decimals via EXACT integer rounding
    (floor((20*sum + n) / (2n)) / 1e4 — half rounds toward +inf):
    logit is a rational that genuinely lands on 1e-5 halves, where
    Spark's shortest-repr HALF_UP and DuckDB's binary round disagree,
    so engine round() must never touch it. Zero shuffle: hash, weight
    lookup and fold all happen inside one ``transform``/``aggregate``
    over the token array, fused into the scan.

    Trained path (``weights`` = (bucket INT, weight DOUBLE) DataFrame,
    e.g. from a logistic regression fit): tokens explode to hashed
    buckets, broadcast-join the weight table (a fastText model is MBs —
    always broadcastable), and aggregate per document. One shuffle keyed
    on the document id.

    Returns (id, n_tokens, logit, prob) with logit/prob round(4).
    """
    from walker_spark.operators.dedup import tokens

    toks_col = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    if weights is None:
        def w_int(b):
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + ":"), b.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            return (h % 2001) - 1000

        def bucket(s):
            return (
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % dim
            )

        base = df.select(
            F.col(id_col).alias("id"),
            *[F.col(c) for c in passthrough],
            toks_col.alias("_t"),
        )
        n = F.size("_t").cast("long")
        total = F.aggregate(
            F.transform("_t", lambda s: w_int(bucket(s))),
            F.lit(0).cast("long"),
            lambda acc, w: acc + w,
        )
        # exact half-up-at-4-decimals: floor((20*total + n) / (2n)).
        # Both operands are exact int64s in double; the quotient is
        # either exactly an integer (division is correctly rounded) or
        # >= 1/(2n) away from one, so floor never flips on FP error.
        logit = F.when(
            n > 0,
            F.floor((20 * total + n) / (2 * n)).cast("double") / 10000.0,
        ).otherwise(F.lit(0.0))
    else:
        exploded = (
            df.select(F.col(id_col).alias("id"), F.explode(toks_col).alias("_s"))
            .select(
                "id",
                (
                    F.conv(F.substring(F.md5("_s"), 1, 8), 16, 10).cast("long") % dim
                ).cast("int").alias("bucket"),
            )
        )
        per_doc = (
            exploded.join(F.broadcast(weights), "bucket", "left")
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_sum"),
            )
        )
        base = df.select(
            F.col(id_col).alias("id"), *[F.col(c) for c in passthrough]
        ).join(per_doc, "id", "left")
        n = F.coalesce(F.col("_n"), F.lit(0))
        logit = F.when(
            n > 0, F.col("_sum") / n.cast("double")
        ).otherwise(F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return base.select(
        "id",
        *[F.col(c) for c in passthrough],
        n.cast("long").alias("n_tokens"),
        F.round(logit, 4).alias("logit"),
        F.round(prob, 4).alias("prob"),
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    score_col: str = "avg_logprob",
    id_col: str = "id",
    partitions: int | None = None,
) -> DataFrame:
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020 §4.3:
    after LM scoring, the corpus is cut into equal-size perplexity
    terciles; most pipelines keep head+middle). Input is a scored
    table (e.g. ``bigram_lm_scores`` output); output adds
    ``ppl_bucket`` — ``labels[floor(rank*n_buckets/n)]`` with rank by
    (score desc, id asc), so bucket sizes differ by at most one row
    and the assignment is pure integer math (exactly replayable in
    ANSI SQL; no FP quantile thresholds to diverge cross-engine).

    Scale shape — a distributed global rank, never a one-partition
    window: ``repartitionByRange`` on the rank order gives each
    partition a contiguous rank range; per-partition row_number
    (window keyed on the partition id) plus a broadcast offset table
    (one row per partition: cumulative count, computed from a
    partition-count aggregate that reduces map-side to ``P`` rows)
    yields the exact global rank with two corpus exchanges total.
    The ranged table is localCheckpointed (materialized once): the
    offsets branch and the rank branch MUST see the same partition
    assignment, and ``repartitionByRange``'s sampled bounds are not
    guaranteed to replay identically across two lazy evaluations —
    at production scale this is the table you'd persist. The bounds
    themselves only decide WHERE a row ranks locally, never its
    global rank, so output is deterministic regardless of sampling.
    Ties are impossible: ``id_col`` is unique and last in the order.
    """
    if n_buckets != len(labels):
        raise ValueError("labels must have n_buckets entries")
    from pyspark.sql import Window

    spark = scored.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    ranged = (
        scored.repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # P-row table: per-partition counts -> exclusive prefix offsets +
    # grand total (single-partition window over <=P rows, by design)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(w_all).alias("_n"),
        )
    )
    w_pid = Window.partitionBy("_pid").orderBy(*order)
    lab = F.array(*[F.lit(s) for s in labels])
    return (
        ranged.withColumn("_rn", F.row_number().over(w_pid))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            "_bkt",
            F.expr(f"(( _off + _rn - 1) * {int(n_buckets)}) div _n").cast("int"),
        )
        .select(
            *[c for c in scored.columns],
            F.element_at(lab, F.col("_bkt") + 1).alias("ppl_bucket"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    top_v: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-prep vocabulary curve: the ``top_v`` most frequent
    tokens and the cumulative fraction of the corpus token stream each
    prefix of the vocabulary covers (the standard "how big must the
    vocab be" planning pass before training a tokenizer).

    Returns ``(rank, term, cnt, cum_cnt, coverage_ppm)`` ordered by
    (cnt desc, term asc); ``coverage_ppm = (cum_cnt * 1_000_000) div
    total_tokens`` — pure integer math, so the row values are
    bit-identical cross-engine (no float anywhere).

    Scale shape: one corpus scan into a (term)-keyed count with
    map-side partial aggregation; the top-``top_v`` cut is a
    sort-limit (per-partition top-k then a single merge — the full
    vocabulary never sorts globally), and the cumulative window runs
    over only ``top_v`` rows. The total-token count rides the plan as
    a broadcast one-row aggregate.
    """
    from pyspark.sql import Window

    from walker_spark.operators.dedup import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    stream = docs.select(F.explode(toks).alias("term"))
    counts = stream.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = stream.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(top_v)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("cum_cnt", F.sum("cnt").over(w))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("term").asc()))
            .cast("int"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "term",
            "cnt",
            "cum_cnt",
            F.expr("(cum_cnt * 1000000L) div _total").alias("coverage_ppm"),
        )
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    partitions: int | None = None,
) -> DataFrame:
    """EXACT distributed percentiles (type-1 / lower nearest-rank:
    the element at 1-based rank ``floor(q * (n - 1)) + 1`` in value
    order) — the corpus-profiling pass (length cutoffs, score
    thresholds) where approx_percentile's error bars would leak into
    downstream filter semantics.

    Returns ``(q, value, rank, n)`` — one row per requested quantile.
    Rank selection is pure integer math off a single float product of
    driver literals, so the selected VALUE is deterministic and
    cross-engine exact even with ties (ties permute ranks only among
    equal values).

    Scale shape: the perplexity_buckets distributed-rank machinery —
    ``repartitionByRange`` on the value (localCheckpointed ONCE; the
    offsets branch and the rank branch must share the sampled
    partition assignment), per-partition ``row_number`` keyed on the
    partition id, a broadcast P-row prefix-offset table, then the
    target ranks (|qs| rows) broadcast against the ranked stream. Two
    corpus exchanges total, no global sort, no one-partition window.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.select(F.col(value_col).alias("_v"))
        .repartitionByRange(p, F.col("_v").asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(w_all).alias("_n"),
        )
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    targets = qdf.crossJoin(
        F.broadcast(offsets.select("_n").limit(1))
    ).select(
        "q",
        (F.floor(F.col("q") * (F.col("_n") - 1)) + 1).cast("long").alias("_target"),
        F.col("_n").alias("n"),
    )
    w_pid = Window.partitionBy("_pid").orderBy(F.col("_v").asc())
    ranked = (
        ranged.withColumn("_rn", F.row_number().over(w_pid))
        .join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .select("_v", (F.col("_off") + F.col("_rn")).cast("long").alias("_gr"))
    )
    return (
        ranked.join(
            F.broadcast(targets), ranked["_gr"] == targets["_target"]
        )
        .select(
            "q",
            F.col("_v").alias("value"),
            F.col("_gr").alias("rank"),
            "n",
        )
    )


def tokenize_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_term_col: str = "term",
    vocab_id_col: str = "rank",
    oov_id: int = 0,
) -> DataFrame:
    """Map the corpus to token-id sequences against a trained
    vocabulary — the pre-training tokenization pass that follows
    :func:`vocab_coverage` (whose output, (rank, term, ...), is a
    valid ``vocab`` as-is: rank IS the token id, ``oov_id=0`` is
    reserved because ranks start at 1).

    Returns ``(id, ids, n_tokens, n_oov)`` where ``ids`` is the
    position-ordered ``array<int>`` of token ids (OOV tokens map to
    ``oov_id``). Documents whose normalized text has no tokens emit no
    row (nothing to train on); left-join back to the corpus if the
    empty docs must be carried.

    Scale shape: tokens posexplode in the scan task, the vocabulary
    broadcast-joins onto the token stream (a tokenizer vocab is MBs —
    always broadcastable), and the ONE corpus exchange is the
    reassembly aggregate keyed on the doc id; the id sequence is
    rebuilt with sort_array over (pos, id) structs, so the output is
    independent of partitioning. Zero Python.
    """
    from walker_spark.operators.dedup import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    stream = docs.select(F.col(id_col).alias("id"), toks.alias("_t")).select(
        "id", F.posexplode("_t").alias("pos", "term")
    )
    v = vocab.select(
        F.col(vocab_term_col).alias("term"),
        F.col(vocab_id_col).cast("int").alias("_tid"),
    )
    tagged = stream.join(F.broadcast(v), "term", "left").select(
        "id",
        "pos",
        F.coalesce("_tid", F.lit(int(oov_id)).cast("int")).alias("_tid"),
    )
    return (
        tagged.groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "_tid"))),
                lambda s: s["_tid"],
            ).alias("ids"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum((F.col("_tid") == oov_id).cast("long")).alias("n_oov"),
        )
        .select("id", "ids", "n_tokens", "n_oov")
    )


def quality_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    c4_min_line_words: int = 5,
    c4_min_sentences: int = 3,
    min_stop_hits: int = 2,
    gopher_min_words: int = 50,
    min_prob: float = 0.5,
    classifier_dim: int = 4096,
    classifier_seed: str = "qc1",
) -> DataFrame:
    """The full document-cleaning chain as ONE fused pass — the
    C4 -> Gopher -> classifier order real pre-training pipelines run
    (FineWeb / RefinedWeb shape): C4 line-filters the raw text, Gopher
    and the hashed linear classifier then judge the CLEANED text, and
    the document survives only if every gate passes.

    Returns ``(id, c4_pass, gopher_pass, prob, quality_pass,
    fail_reasons)`` — ``fail_reasons`` is a comma-joined list drawn
    from {c4, gopher, classifier} in that fixed order (empty when the
    doc passes).

    Scale shape: all three gates are zero-shuffle narrow projections,
    and chaining happens through the ``passthrough`` columns — the
    whole verdict computes in ONE whole-stage-codegen scan of the
    corpus with ZERO exchanges (PLANS.md asserts it). Each stage's
    rule inputs stay available upstream (call the stages directly for
    re-thresholding); this operator is the verdict projection.
    """
    c4 = c4_rules(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_line_words=c4_min_line_words,
        min_sentences=c4_min_sentences,
    )
    g = gopher_rules(
        c4,
        id_col="id",
        text_col="clean_text",
        min_words=gopher_min_words,
        min_stop_hits=min_stop_hits,
        passthrough=("c4_pass", "clean_text"),
    )
    hc = hash_classifier_scores(
        g,
        id_col="id",
        text_col="clean_text",
        dim=classifier_dim,
        seed=classifier_seed,
        passthrough=("c4_pass", "gopher_pass"),
    )
    passes = (
        F.col("c4_pass")
        & F.col("gopher_pass")
        & (F.col("prob") >= F.lit(min_prob))
    )
    return hc.select(
        "id",
        "c4_pass",
        "gopher_pass",
        "prob",
        passes.alias("quality_pass"),
        F.concat_ws(
            ",",
            F.when(~F.col("c4_pass"), F.lit("c4")),
            F.when(~F.col("gopher_pass"), F.lit("gopher")),
            F.when(F.col("prob") < min_prob, F.lit("classifier")),
        ).alias("fail_reasons"),
    )


# Winnowing packs (hash32, reversed-pos) into ONE BIGINT so the
# rightmost-min tie-break rides the same window min: positions must
# stay below 2^31 (a 2-billion-token document would overflow the pack
# — far past any real document).
_WINNOW_POS_LIMIT = 2_147_483_648  # 2^31


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    word ``k``-gram, slide a window of ``w`` consecutive hashes, and in
    each window select the minimum hash — rightmost position on ties —
    keeping the distinct selected (position, hash) pairs per document.

    Guarantee (the paper's correctness property): any run of at least
    ``w + k - 1`` shared tokens between two documents contributes at
    least one identical fingerprint to both, while only ~2/(w+1) of
    the k-gram hashes are stored. Documents with fewer than
    ``w + k - 1`` tokens have no full window and emit no rows.

    Returns ``(id, pos, hash32)`` — all integer math (the hash is the
    first 8 md5 hex digits, the tie-break a packed integer key), so
    the output is bit-identical across engines and partitionings.

    Scale shape: gram hashes materialize in the scan task
    (positional_ngrams' zero-shuffle projection); the ONLY exchange is
    the per-document window (hashpartitioning on the doc id — per-doc
    keys, perfectly spread); the rightmost-min tie-break rides the
    same window min as a packed (hash, 2^31-1-pos) key, and the
    distinct selected pairs collapse in the same doc-keyed
    distribution (no second shuffle).
    """
    from pyspark.sql import Window

    from walker_spark.operators.dedup import positional_ngrams

    grams = positional_ngrams(df, id_col, text_col, k)
    keyed = grams.select(
        "_id",
        "pos",
        (
            F.conv(F.substring("gram_key", 1, 8), 16, 10).cast("long")
            * F.lit(_WINNOW_POS_LIMIT)
            + (F.lit(_WINNOW_POS_LIMIT - 1) - F.col("pos"))
        ).alias("_key"),
    )
    win = Window.partitionBy("_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    selected = (
        keyed.withColumn("_minkey", F.min("_key").over(win))
        # pos is dense from 0, so the window ending here holds w full
        # grams iff pos >= w-1 (partial head windows select nothing)
        .filter(F.col("pos") >= w - 1)
        .select("_id", "_minkey")
        .distinct()
    )
    return selected.select(
        F.col("_id").alias("id"),
        (F.lit(_WINNOW_POS_LIMIT - 1) - F.col("_minkey") % _WINNOW_POS_LIMIT)
        .cast("long")
        .alias("pos"),
        F.expr(f"_minkey div {_WINNOW_POS_LIMIT}").cast("long").alias("hash32"),
    )


def _bpe_word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(syms, cnt): the word-frequency table BPE iterates on — the ONE
    corpus scan (word-keyed shuffle), each word split to characters."""
    from walker_spark.operators.dedup import tokens

    return (
        df.select(
            F.explode(
                F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.split("w", "").alias("syms"), "cnt")
    )


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, pc) adjacent-pair corpus frequencies over the word table,
    ordered by (pc desc, l, r) — .limit(1) is the round's winner."""
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.try_element_at("syms", i).alias("l"),
                        F.try_element_at("syms", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pc"))
        .orderBy(F.col("pc").desc(), F.col("l").asc(), F.col("r").asc())
    )


def bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges (Sennrich,
    Haddow & Birch, ACL 2016) over the corpus: words start as character
    sequences; each round the globally most frequent adjacent symbol
    pair (ties: lexicographic (left, right) asc) becomes a new symbol,
    applied left-to-right non-overlapping within every word.

    Returns the learned merge table (step, left, right, merged,
    pair_count) — pair counts are exact BIGINT corpus frequencies, so
    the merge sequence is deterministic and bit-identical cross-engine.
    No end-of-word marker is added (pure within-word merges).

    Scale shape: the corpus text is read EXACTLY once — the word-
    frequency table (one shuffle keyed on the word) is what iterates,
    and it is vocabulary-sized (MBs at web scale), not corpus-sized.
    Each round is one small pair-count aggregation plus a zero-shuffle
    merge projection (the left-to-right application is an in-task
    higher-order fold), localCheckpointed once per round exactly like
    the pagerank/HITS iteration machinery. The winning pair travels as
    a driver literal (a one-row collect of a vocabulary-sized agg —
    the k-means-centroid precedent).
    """
    from walker_spark.operators.dedup import tokens

    spark = df.sparkSession
    words = _bpe_word_table(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = _bpe_pair_counts(words).limit(1).collect()
        if not top:
            break
        a, b, pc = top[0]["l"], top[0]["r"], int(top[0]["pc"])
        merges.append((step, a, b, a + b, pc))
        la, lb, lm = F.lit(a), F.lit(b), F.lit(a + b)

        def make_fold(la, lb, lm):
            def fold(acc, s):
                # replace-last == the left-to-right scan: a just-merged
                # element equals left||right != left (right is
                # non-empty), so it never re-triggers as the pair's
                # left side
                hit = (F.try_element_at(acc, F.lit(-1)) == la) & (s == lb)
                return F.when(
                    hit,
                    F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lm)),
                ).otherwise(F.concat(acc, F.array(s)))

            return fold

        fold = make_fold(la, lb, lm)

        words = words.select(
            F.aggregate(
                "syms", F.expr("cast(array() as array<string>)"), fold
            ).alias("syms"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count long"
    )


def bpe_apply(word: str, ranks: dict) -> list:
    """Greedy min-rank BPE application (the GPT-2 encoder.py shape,
    public code): repeatedly merge every left-to-right non-overlapping
    occurrence of the lowest-ranked adjacent pair present. Equivalent
    to applying the merge table one step at a time in training order
    — a merge can never create a new adjacency between two symbols
    that both existed at an earlier step (the new symbol sits between
    its neighbours), so step-order and rank-greedy visit the same
    pairs in the same order; the randomized pytest replays both."""
    syms = list(word)
    while len(syms) >= 2:
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        a, b = best[1]
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the trained tokenizer over the corpus: apply a
    :func:`bpe_merges` merge table to every document, returning
    ``(id, syms, n_tokens)`` where ``syms`` is the position-ordered
    ``array<string>`` of subword symbols (documents with no tokens
    emit no row — the :func:`tokenize_ids` contract).

    Scale shape: the merge table is KBs–MBs (32k merges ≈ 1 MB) and
    rides the UDF closure as a rank dict; tokens posexplode in the
    scan task and the per-word merge application is ONE Arrow batch
    stage over the token stream with a per-worker word cache (Zipf
    law makes the hit rate ~99% — the word-cache trick every
    production tokenizer uses), so the corpus is never joined or
    shuffled by word; the ONE exchange is the doc-keyed reassembly
    aggregate, identical to tokenize_ids. Output independent of
    partitioning (sort_array over (pos, syms) structs)."""
    from pyspark.sql.types import ArrayType, StringType

    from walker_spark.operators.dedup import tokens

    mrows = merges.orderBy("step").select("left", "right").collect()
    ranks = {(r["left"], r["right"]): i for i, r in enumerate(mrows)}
    cache: dict = {}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        def one(w):
            got = cache.get(w)
            if got is None:
                if len(cache) > 1 << 18:  # bound worker memory
                    cache.clear()
                got = bpe_apply(w, ranks)
                cache[w] = got
            return got

        return words.map(one)

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    stream = docs.select(F.col(id_col).alias("id"), toks.alias("_t")).select(
        "id", F.posexplode("_t").alias("pos", "term")
    )
    tagged = stream.select("id", "pos", enc("term").alias("_s"))
    return (
        tagged.groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "_s"))),
                    lambda s: s["_s"],
                )
            ).alias("syms")
        )
        .select("id", "syms", F.size("syms").cast("long").alias("n_tokens"))
    )


# Unicode-hygiene regexes shared with the driver oracle (RE2 and Java
# regex both parse \x{...}): non-whitespace C0/C1-ish controls + the
# zero-width family; whitespace collapse is the explicit ASCII class
# (never \s — Java and RE2 disagree on \x0b, which the strip class
# removes first anyway).
NORM_STRIP_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x{200b}\x{200c}\x{200d}\x{feff}]"
NORM_WS_RE = r"[ \t\n\r]+"


def text_normalize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode-hygiene pass every web-text pipeline runs before any
    hashing/tokenizing op (content keys, shingles, token counts all
    change under NFC): canonical NFC composition, then strip
    non-whitespace control chars + the zero-width family
    (U+200B/C/D, U+FEFF), then collapse ``[ \\t\\n\\r]+`` runs to one
    space and trim.

    Returns ``(id, text_norm, n_raw, n_norm, changed)`` — lengths are
    code-point counts, ``changed`` compares the normalized text to the
    raw input.

    Scale shape: a ZERO-exchange projection. NFC is the one step Spark
    has no built-in for, so it runs as an Arrow pandas UDF with a
    C-speed ``str.isascii()`` fast path (web corpora are mostly ASCII;
    only non-ASCII strings pay the normalize call); the strip/collapse
    regexes stay JVM-side so the Arrow batch carries each string
    exactly once each way. Cross-engine exact: DuckDB's
    ``nfc_normalize`` and Python's ``unicodedata`` both implement
    UAX#15 canonical composition (parity incl. combining-mark
    reordering is pytest-asserted).
    """
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: x
            if x is None or x.isascii()
            else unicodedata.normalize("NFC", x)
        )

    raw = F.col(text_col)
    stripped = F.regexp_replace(_nfc(raw), NORM_STRIP_RE, "")
    norm = F.trim(F.regexp_replace(stripped, NORM_WS_RE, " "))
    return df.select(
        F.col(id_col).alias("id"),
        norm.alias("text_norm"),
        F.length(raw).cast("long").alias("n_raw"),
        F.length(norm).cast("long").alias("n_norm"),
        (norm != raw).alias("changed"),
    )


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT per-group type-1 percentiles (rank ``floor(q*(n-1)) + 1``
    within each group's value order) — the per-language / per-source
    corpus-profiling pass (length cutoffs per language, score
    thresholds per domain) where a global :func:`exact_percentiles`
    would mix distributions.

    Returns ``(group_col, q, value, rank, n)``.

    Scale shape: the corpus collapses to a per-(group, value)
    HISTOGRAM in ONE map-side-combined exchange; the cumulative and
    total windows then run per group on that aggregated table, so a
    window partition is bounded by the group's DISTINCT values, not
    its row count — a 10^9-doc language with a few thousand distinct
    token counts is a few-thousand-row window. (For continuous
    double-valued columns where distinct≈rows, quantize first or use
    :func:`exact_percentiles` per group — this operator's contract is
    discrete profiling columns.) Rank targets are pure integer math
    off a float product of driver literals, so the selected value is
    deterministic and cross-engine exact even with ties.
    """
    from pyspark.sql import Window

    hist = (
        df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
        .groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("_g")
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        hist.select(
            "_g",
            "_v",
            "_cnt",
            F.sum("_cnt").over(w_cum).alias("_cum"),
            F.sum("_cnt").over(w_all).alias("_n"),
        )
        .select("_g", "_v", "_cnt", "_cum", "_n", F.explode(qarr).alias("q"))
        .withColumn(
            "_target",
            (F.floor(F.col("q") * (F.col("_n") - 1)) + 1).cast("long"),
        )
        .filter(
            (F.col("_target") > F.col("_cum") - F.col("_cnt"))
            & (F.col("_target") <= F.col("_cum"))
        )
        .select(
            F.col("_g").alias(group_col),
            "q",
            F.col("_v").alias("value"),
            F.col("_target").alias("rank"),
            F.col("_n").cast("long").alias("n"),
        )
    )


def novelty_scores(
    df: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus — the
    memorization-risk / train-test-overlap audit (the generation-side
    twin of decontamination: Carlini et al. 2022 quantify memorization
    by exactly this overlap; RAVEN-style novelty reports use the same
    statistic): the fraction of a document's distinct n-gram TYPES
    absent from the reference.

    Returns ``(id, n_grams, n_novel, novelty_ppm)`` — all BIGINT
    (``novelty_ppm = n_novel * 1e6 div n_grams``; no float anywhere).
    Documents with fewer than ``n`` tokens emit no row (nothing to
    audit); left-join back if they must be carried.

    Scale shape: both corpora collapse to DISTINCT md5 gram keys in
    their scan tasks (the shuffle moves 32-byte keys, never text —
    same contract as dup_ngram_spans), the membership probe is one
    gram-keyed left join, and the per-doc roll-up is one doc-keyed
    aggregate. A reference of 10^11 grams is fine: it is never
    broadcast, never collected, and the join key is uniform md5.
    """
    from walker_spark.operators.dedup import positional_ngrams

    doc_g = (
        positional_ngrams(df, id_col, text_col, n)
        .select("_id", "gram_key")
        .distinct()
    )
    ref_g = (
        positional_ngrams(reference, ref_id_col, ref_text_col, n)
        .select("gram_key")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        doc_g.join(ref_g, "gram_key", "left")
        .groupBy(F.col("_id").alias("id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty_ppm", F.expr("(n_novel * 1000000L) div n_grams"))
    )


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise n-gram overlap matrix BETWEEN SOURCES — the dataset-
    forensics pass that catches one dump re-packaging another (the
    C4-inside-CommonCrawl / books-mirror problem) before mixture
    weights are chosen on the assumption the sources are independent.
    For every source pair: distinct n-gram type counts, the common-type
    count, and Jaccard in integer ppm.

    Returns ``(source_a, source_b, grams_a, grams_b, common,
    jaccard_ppm)`` — all counts BIGINT, ``source_a < source_b``,
    ``jaccard_ppm = common * 1e6 div (grams_a + grams_b - common)``.
    Pairs sharing NO gram are omitted (the matrix is sparse — at
    thousands of sources the zero cells dominate and carry nothing).

    Scale shape: the corpus collapses to DISTINCT (source, md5-gram)
    pairs in one gram-keyed exchange (text never shuffles); per-source
    totals are a tiny agg off that table; the pair matrix is a gram-
    keyed self-join whose per-gram fan-out is bounded by the number of
    SOURCES carrying the gram (≤ S, i.e. dozens) — never a doc-level
    blow-up — and the result aggregates to S²/2 rows. Totals broadcast
    onto the matrix.
    """
    from walker_spark.operators.dedup import positional_ngrams

    sg = (
        positional_ngrams(df, source_col, text_col, n)
        .select(F.col("_id").alias("source"), "gram_key")
        .distinct()
    )
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    a = sg.select(F.col("source").alias("source_a"), "gram_key")
    b = sg.select(F.col("source").alias("source_b"), "gram_key")
    common = (
        a.join(b, "gram_key")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "grams_a",
            "grams_b",
            "common",
            F.expr("(common * 1000000L) div (grams_a + grams_b - common)").alias(
                "jaccard_ppm"
            ),
        )
    )


def quantile_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group quantile trimming — the CCNet-style per-language
    cleaning action built on :func:`grouped_percentiles`: keep only
    rows whose ``value_col`` lies within the group's [lo_q, hi_q]
    type-1 quantile VALUES (inclusive; equal values at the cut always
    land on the same side, so the filter is deterministic under ties).
    The per-language length trim that drops truncated snippets and
    concatenation monsters without imposing one global cutoff.

    Returns the input rows (all columns) plus ``lo_value``/``hi_value``
    the row was tested against.

    Scale shape: the cutoff table is ``grouped_percentiles`` output
    (rows = 2 × #groups) broadcast back onto the corpus — the 100 TB
    scan is filtered map-side; the only corpus exchange is the
    histogram aggregate inside the percentile pass.
    """
    pct = grouped_percentiles(df, group_col, value_col, qs=(lo_q, hi_q))
    lo = float(min(lo_q, hi_q))
    cuts = pct.groupBy(group_col).agg(
        F.min(F.when(F.col("q") == lo, F.col("value"))).alias("lo_value"),
        F.max(F.when(F.col("q") != lo, F.col("value"))).alias("hi_value"),
    )
    return (
        df.join(F.broadcast(cuts), group_col)
        .filter(
            (F.col(value_col) >= F.col("lo_value"))
            & (F.col(value_col) <= F.col("hi_value"))
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` bigram collocations ranked by pointwise mutual
    information (Church & Hanks 1990), computed EXACTLY in integers:

        lift_ppm = floor(1e6 * c_ab * N^2 / (B * c_a * c_b))

    with N total tokens, B total bigrams, c_* corpus counts. PMI =
    ln(lift_ppm / 1e6) is monotone in the lift, so ranking by the
    integer IS ranking by PMI — no float (and no engine-``ln``
    divergence risk) anywhere. ``(w1, w2, c_ab, c_a, c_b, lift_ppm)``,
    all BIGINT, ordered/tie-broken (lift_ppm desc, w1, w2).

    Scale shape: two two-phase count aggs (unigram, bigram — shuffle
    keys are tokens/pairs, AQE absorbs stopword skew), the two corpus
    totals ride the plan as broadcast one-row aggregates, the c_a/c_b
    attach is a pair of hash equi-joins, and the final top-k is a
    sort-limit (TakeOrdered — per-partition heaps, never a full sort).
    The big products run in DECIMAL(38,0) with integer ``div``
    (ANSI-safe; a BIGINT product overflows at web scale)."""
    from walker_spark.operators.dedup import tokens

    if min_count < 1 or top_k < 1:
        raise ValueError(f"bad params: min_count={min_count} top_k={top_k}")
    t = tokens(F.col(text_col))
    toks = docs.select(t.alias("_t")).filter(
        (F.size("_t") >= 1) & (F.element_at("_t", 1) != "")
    )
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_tot = uni.agg(F.sum("c").cast("decimal(38,0)").alias("_N"))
    bi = (
        toks.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - 2),
                    lambda i: F.struct(
                        F.element_at("_t", i + 1).alias("w1"),
                        F.element_at("_t", i + 2).alias("w2"),
                    ),
                )
            ).alias("_b")
        )
        .select("_b.w1", "_b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    b_tot = bi.agg(F.sum("c_ab").cast("decimal(38,0)").alias("_B"))
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(b_tot))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "(CAST(c_ab AS DECIMAL(38,0)) * _N * _N * 1000000)"
                " div (_B * CAST(c_a AS DECIMAL(38,0))"
                " * CAST(c_b AS DECIMAL(38,0)))"
            ).alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("lift_ppm"), F.asc("w1"), F.asc("w2")
    ).limit(top_k)


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF — the metadata tag every
    corpus card / topic filter draws (salient terms per doc).

    Score = ``tf * idf_micro`` where ``idf_micro = floor(ln(N / df) *
    1e6 + 0.5)`` quantizes the IDF to integer micro-units at the term
    level (the BM25 precedent, retrieval.py:21-24): after quantization
    every score is an exact int64, so ranking and the DuckDB oracle
    are bit-deterministic on any partitioning. ``min_df`` prunes
    ultra-rare terms (df < min_df), which otherwise monopolize the
    top-k with maximal idf.

    Shapes: reuses the BM25 postings machinery — one (id, dl, term)
    aggregation, a term-keyed join against the document-frequency
    table, corpus N as a broadcast one-row scalar; top-k is a window
    over per-DOC partitions (bounded by the doc's distinct terms,
    never a global sort). Ties break on the term string, so the k-th
    boundary is deterministic. Returns ``(doc_id, term, tf,
    score_micro, rank)``.
    """
    from pyspark.sql import Window

    from walker_spark.operators.retrieval import (
        MICRO,
        _corpus_stats,
        _postings,
        _tokenized,
    )

    if top_k < 1 or min_df < 1:
        raise ValueError("need top_k >= 1 and min_df >= 1")
    base = _tokenized(docs, id_col, text_col)
    posts = _postings(base)
    dfreq = (
        posts.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .filter(F.col("_df") >= min_df)
    )
    stats = _corpus_stats(base)
    scored = (
        posts.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("_N").cast("double") / F.col("_df").cast("double"))
                    * F.lit(MICRO)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


#: Flesch reading-ease constants in milli-units (206.835 / 1.015 /
#: 84.6 — Flesch 1948; public formula). Kept integer so the score is
#: exact on both engines.
_FRE_BASE_MILLI = 206_835
_FRE_WPS_MILLI = 1_015
_FRE_SPW_MILLI = 84_600


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease per document, integer-quantized — the
    classic readability feature of web-text quality filters.

    Components are plain counts: words = whitespace tokens, sentences
    = runs of ``[.!?]`` (floored at 1 so punctuation-free docs don't
    divide by zero), syllables ~= vowel-group runs ``[aeiouy]+`` over
    the lowercased text (the standard cheap proxy). Score::

        fre_milli = 206835 - (1015 * W) div S - (84600 * Y) div W

    — the formula's two ratio terms each quantized by integer
    division, so the whole row is exact int64 cross-engine (no float
    anywhere; same rule as gopher_rules/c4_rules). Regex literals are
    shared verbatim between Java regex and RE2 (text_normalize
    precedent). Zero-shuffle: one projection over the corpus scan.
    Returns ``(doc_id, n_words, n_sentences, n_syllables,
    fre_milli)``."""
    from walker_spark.operators.dedup import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    w = F.size(toks).cast("long")
    s = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")).cast("long"),
        F.lit(1).cast("long"),
    )
    y = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+")).cast(
        "long"
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        w.alias("n_words"),
        s.alias("n_sentences"),
        y.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    fre = (
        F.lit(_FRE_BASE_MILLI).cast("long")
        - F.expr(f"({_FRE_WPS_MILLI} * n_words) div n_sentences")
        - F.expr(f"({_FRE_SPW_MILLI} * n_syllables) div n_words")
    )
    return base.select("*", fre.alias("fre_milli"))


def host_boilerplate(
    df: DataFrame,
    n: int = 3,
    boiler_ppm_threshold: int = 500_000,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
) -> DataFrame:
    """Host-scoped templated-content detection: how much of each
    document is its site's own boilerplate (nav bars, footers, cookie
    banners, product-page scaffolding). A gram is BOILERPLATE for a
    host when it appears in at least ``boiler_ppm_threshold`` ppm of
    that host's documents (hosts with fewer than ``min_docs`` docs
    never flag — one page can't define a template). The host-conditional
    complement of :func:`~walker_spark.operators.dedup.line_dedup`'s
    global duplicated-line pass: CCNet/RefinedWeb strip cross-corpus
    boilerplate, while per-site template ratio is the standard content-
    extraction quality signal (a doc that is 90% site chrome carries
    almost no trainable text).

    Returns ``(doc_id, host, n_grams, n_boiler, boiler_ppm)`` — all
    counts over distinct n-gram TYPES, ``boiler_ppm = n_boiler * 1e6
    div n_grams``, BIGINT end to end (both threshold tests are integer
    cross-multiplications; no float exists, so the DuckDB oracle
    matches bit-for-bit). Documents with fewer than ``n`` tokens emit
    no row (novelty_scores contract).

    Scale shape: text collapses to distinct (doc, gram-md5) keys in the
    scan tasks; the per-host doc count is a tiny broadcast; gram
    doc-frequency is one (host, gram)-keyed aggregation with map-side
    partials (a mega-host is a hot reduce key, never a hot window
    partition); the boiler set joins back on the same (host, gram) key
    and the roll-up is one doc-keyed aggregate. Text never shuffles.
    """
    from walker_spark.operators.dedup import positional_ngrams

    hosts = df.select(F.col(id_col).alias("_id"), F.col(host_col).alias("host"))
    gh = (
        positional_ngrams(df, id_col, text_col, n)
        .select("_id", "gram_key")
        .distinct()
        .join(hosts, "_id")
    )
    host_docs = hosts.distinct().groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs")
    )
    boiler = (
        gh.groupBy("host", "gram_key")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .join(F.broadcast(host_docs), "host")
        .filter(
            (F.col("_n_docs") >= min_docs)
            & (F.col("_df") * F.lit(1_000_000) >= F.lit(boiler_ppm_threshold) * F.col("_n_docs"))
        )
        .select("host", "gram_key", F.lit(1).alias("_b"))
    )
    return (
        gh.join(boiler, ["host", "gram_key"], "left")
        .groupBy(F.col("_id").alias("doc_id"), "host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long").alias("n_boiler"),
        )
        .withColumn("boiler_ppm", F.expr("(n_boiler * 1000000L) div n_grams"))
    )


_QLOG = "CAST(FLOOR(LOG({x}) * 1000000.0D + 0.5D) AS BIGINT)"


def _boundaries_sql(sorted_col: str) -> str:
    """1-based indexes of run ENDS in an (already sorted) array column
    — empty array in, empty array out (guarded: Spark's
    ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, not empty).
    ``sorted_col`` must be a plain column NAME (a bound attribute),
    never an inline expression: ``element_at`` inside the lambda is
    evaluated once per element, and an inline ``array_sort(...)``
    there would re-sort per access — O(n² log n) per row (measured:
    150 s vs ~2 s at sf0.01)."""
    n = f"size({sorted_col})"
    return (
        f"IF({n} = 0, array(), "
        f"filter(sequence(1, {n}), i -> i = {n} "
        f"OR element_at({sorted_col}, i + 1) != element_at({sorted_col}, i)))"
    )


def _run_lengths_sql(bounds_col: str) -> str:
    """Run lengths from the boundary-index column: each run's length is
    its end index minus the previous run's end (0-prepended shift)."""
    b = bounds_col
    return (
        f"IF(size({b}) = 0, CAST(array() AS array<bigint>), "
        f"zip_with({b}, concat(array(0), slice({b}, 1, size({b}) - 1)), "
        f"(a, b) -> CAST(a - b AS BIGINT)))"
    )


def _entropy_micro_sql(rl_col: str, n_sql: str) -> str:
    """Shannon entropy in integer micro-nats from a run-length column:
    ``H_micro = (n*qlog(n) - sum_c c*qlog(c)) div n`` with ``qlog(x) =
    floor(ln(x)*1e6 + 0.5)`` — the repo's order-invariant micro-unit
    quantization (BM25 precedent; DuckDB replays the identical
    quantized terms, so the integer sum has no float-order
    sensitivity). The numerator is non-negative because qlog is
    monotone, so truncating and flooring division agree cross-engine."""
    qn = _QLOG.format(x=f"CAST({n_sql} AS DOUBLE)")
    qc = _QLOG.format(x="CAST(c AS DOUBLE)")
    return (
        f"CASE WHEN {n_sql} = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(({n_sql} * {qn} - aggregate({rl_col}, CAST(0 AS BIGINT), "
        f"(acc, c) -> acc + c * {qc})) div {n_sql} AS BIGINT) END"
    )


def entropy_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RedPajama-v2-family entropy quality signals (Together AI 2023;
    the "unigram entropy" / character-diversity signals used to catch
    degenerate boilerplate and keyboard-mash documents): per document,
    the Shannon entropy of its CHARACTER distribution and of its
    whitespace-token distribution, both as exact integer micro-nats
    (BIGINT — no float ever crosses an engine boundary), plus the
    token counts the entropies normalize over.

    Emits ``(id, n_chars, char_entropy_micro, n_tokens,
    distinct_tokens, token_entropy_micro)``.

    Scale shape: a ZERO-exchange projection stack — each document's
    histogram is derived in-row by sorting its char/token array and
    folding run lengths (no explode: a 100 TB corpus would otherwise
    fan out one row PER CHARACTER), no Python anywhere, and document
    text never shuffles. Each stage (sorted array → run boundaries →
    run lengths → fold) is materialized as a real column so every
    array is built ONCE per row — CollapseProject keeps repeatedly-
    referenced non-cheap exprs staged (the CDC-chunks lesson); the
    first draft inlined ``array_sort`` into the boundary lambda and
    re-sorted per element access, 75× slower. The micro-nat
    quantization ``qlog(x) = floor(ln(x)*1e6 + 0.5)`` happens per
    histogram term, so the fold is an integer sum — order-invariant,
    replayed bit-for-bit by the DuckDB oracle (the BM25/tfidf
    micro-unit rule)."""
    chars = f"array_sort(filter(split({text_col}, ''), c -> c != ''))"
    toks = (
        f"array_sort(filter(split({text_col}, '\\\\s+'), t -> t != ''))"
    )
    return (
        df.select(
            F.col(id_col),
            F.expr(chars).alias("_schars"),
            F.expr(toks).alias("_stoks"),
        )
        .select(
            id_col,
            "_schars",
            "_stoks",
            F.expr(_boundaries_sql("_schars")).alias("_cb"),
            F.expr(_boundaries_sql("_stoks")).alias("_tb"),
        )
        .select(
            id_col,
            "_schars",
            "_stoks",
            "_tb",
            F.expr(_run_lengths_sql("_cb")).alias("_crl"),
            F.expr(_run_lengths_sql("_tb")).alias("_trl"),
        )
        .select(
            F.col(id_col),
            F.size("_schars").cast("long").alias("n_chars"),
            F.expr(
                _entropy_micro_sql("_crl", "size(_schars)")
            ).alias("char_entropy_micro"),
            F.size("_stoks").cast("long").alias("n_tokens"),
            F.size("_tb").cast("long").alias("distinct_tokens"),
            F.expr(
                _entropy_micro_sql("_trl", "size(_stoks)")
            ).alias("token_entropy_micro"),
        )
    )


def blocklist_tags(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag_col: str = "tag",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Dolma-style blocklist/lexicon tagging (Soldaini et al. 2024's
    taggers; the UT1-blocklist / bad-words filter every production
    pipeline runs): match a phrase lexicon — each phrase labeled with
    a ``tag`` (e.g. category) — against every document as contiguous
    token runs, and emit per-(doc, tag) hit statistics. SPARSE
    contract: only (doc, tag) pairs with ≥1 hit appear (at 10^10 docs
    × K tags the dense frame is the bug).

    Returns ``(doc_id, tag, n_phrases, n_hits, hit_tokens, hits_ppm)``
    — distinct lexicon phrases matched, total occurrences, tokens
    covered (n_hits weighted by phrase length; OVERLAPPING hits each
    count, so hits_ppm may exceed 1e6 on pathological repeats — the
    honest occurrence count, not a span union), and hit_tokens ×1e6
    div n_tokens (exact integer, oracle-stable).

    Scale shape: the corpus is scanned exactly ONCE — the
    phrase_search fused-gram projection (retrieval.py): distinct
    phrase lengths are driver-collected (bounded by the lexicon, the
    IVF-codebook precedent), one projection emits md5 gram keys for
    every needed length, a single explode, then a BROADCAST join
    against the lexicon keys (lexicons are MBs; the corpus side never
    builds). The only exchange is the final (doc, tag)-keyed aggregate
    over matched rows — shuffle volume is hit count, never corpus
    size, and the keys are 32-byte md5 + tag. Text never shuffles; no
    Python anywhere. Normalization is dedup.tokens — the same
    tokenizer as phrase_search/bm25, so one lexicon serves retrieval
    and filtering identically."""
    from .dedup import tokens

    ptoks = F.filter(tokens(F.col(phrase_col)), lambda s: F.length(s) > 0)
    pkeys = (
        lexicon.select(
            F.col(tag_col).alias("tag"),
            F.md5(F.encode(F.concat_ws(" ", ptoks), "UTF-8")).alias(
                "gram_key"
            ),
            F.size(ptoks).alias("_n"),
        )
        .filter(F.col("_n") > 0)
        # duplicate lexicon lines (same normalized phrase, same tag)
        # collapse so they never double-count
        .dropDuplicates(["tag", "gram_key"])
    )
    lengths = sorted(
        {r["_n"] for r in pkeys.select("_n").distinct().collect()}
    )
    spark = docs.sparkSession
    out_schema = (
        "doc_id long, tag string, n_phrases long, n_hits long, "
        "hit_tokens long, hits_ppm long"
    )
    if not lengths:
        return spark.createDataFrame([], out_schema)

    toks = F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    ).filter(F.size("_t") >= lengths[0])

    def _gram_arr(n: int):
        # unary lambda only: transform() hands a binary lambda the
        # array INDEX as the second arg (the phrase_search gotcha)
        return F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.md5(
                    F.encode(
                        F.concat_ws(" ", F.slice("_t", i + 1, n)), "UTF-8"
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = base.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        F.explode(
            F.flatten(F.array(*[_gram_arr(n) for n in lengths]))
        ).alias("gram_key"),
    )
    return (
        grams.join(F.broadcast(pkeys), "gram_key")
        .groupBy("doc_id", "tag", "n_tokens")
        .agg(
            F.count_distinct("gram_key").cast("long").alias("n_phrases"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum("_n").cast("long").alias("hit_tokens"),
        )
        .select(
            "doc_id",
            "tag",
            "n_phrases",
            "n_hits",
            "hit_tokens",
            F.expr("(hit_tokens * 1000000L) div n_tokens").alias(
                "hits_ppm"
            ),
        )
    )


def term_dispersion(
    df: DataFrame,
    part_col: str = "source",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Term dispersion DP (Gries 2008, "Dispersions and adjusted
    frequencies in corpus linguistics"): how UNEVENLY a term spreads
    across corpus parts —

        DP(t) = 0.5 * sum over parts i of |f_i/F - p_i/P|

    (f_i term count in part i, F its corpus count, p_i the part's
    token total, P the corpus total). DP ~ 0 = spread like a function
    word; DP -> 1 = bursty/topical (concentrated in few parts) — the
    signal keyword extractors and topicality filters use that raw
    frequency can't give. Exact integer form (multiply through by
    2*F*P):

        dp_ppm = (sum_present |f_i*P - p_i*F|
                  + F * (P - sum_present p_i)) * 1e6 div (2*F*P)

    — the absent-part terms fold into the closed second summand, so
    NO (term x part) grid is materialized. DECIMAL(38,0) products
    (they overflow BIGINT at web scale). Returns the ``top_k`` most
    dispersed terms with corpus count >= ``min_count``:
    ``(term, term_total, dp_ppm)``, ordered (dp_ppm desc, term).

    Scale shape: ONE token explode into the per-(part, term) count
    table, localCheckpointed (the dsir explode-once rule — part
    totals, term totals and the corpus scalar all branch off it);
    part totals broadcast (parts are few), term totals ride a window
    over the term key (partition bounded by the part count), the
    final rollup is a term-keyed agg plus a sort-limit."""
    from pyspark.sql import Window

    from walker_spark.operators.dedup import tokens

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1: {top_k}")
    toks = df.select(
        F.col(part_col).alias("part"),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
        ).alias("term"),
    )
    f = (
        toks.groupBy("part", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("f_i"))
        .localCheckpoint()
    )
    p = f.groupBy("part").agg(F.sum("f_i").cast("long").alias("p_i"))
    ptot = p.agg(F.sum("p_i").cast("long").alias("p_all"))
    w_t = Window.partitionBy("term")
    joined = (
        f.join(F.broadcast(p), "part")
        .crossJoin(F.broadcast(ptot))
        .withColumn("term_total", F.sum("f_i").over(w_t).cast("long"))
    )
    agg = (
        joined.groupBy("term", "term_total", "p_all")
        .agg(
            F.expr(
                "CAST(sum(abs(CAST(f_i AS DECIMAL(38,0)) * p_all"
                " - CAST(p_i AS DECIMAL(38,0)) * term_total))"
                " AS DECIMAL(38,0))"
            ).alias("_present"),
            F.sum("p_i").cast("long").alias("_present_p"),
        )
    )
    return (
        agg.filter(F.col("term_total") >= min_count)
        .select(
            "term",
            "term_total",
            F.expr(
                "CAST(((_present + CAST(term_total AS DECIMAL(38,0))"
                " * (p_all - _present_p)) * 1000000)"
                " div (CAST(2 AS DECIMAL(38,0)) * term_total * p_all)"
                " AS BIGINT)"
            ).alias("dp_ppm"),
        )
        .orderBy(F.desc("dp_ppm"), F.asc("term"))
        .limit(top_k)
    )


def vocab_growth(
    df: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-growth (Heaps) curve: how many DISTINCT token types
    the corpus has accumulated after each ``1/n_buckets`` slice of
    documents in ``id_col`` order — the corpus-stats curve that says
    whether a crawl is still discovering new language or re-reading
    the same pages (a flattening curve is the diminishing-returns
    signal collection planners act on).

    Exact one-pass form: a term's FIRST document is ``min(id)`` over
    its occurrences; bucket it by ``floor(first_id * n_buckets div
    (max_id + 1))`` (max as a broadcast one-row scalar) and the curve
    is ``new_terms`` per bucket plus a running ``cum_terms`` window
    over the n_buckets-row result. Returns ``(bucket, new_terms,
    cum_terms)``, all BIGINT; empty buckets are absent (their
    cumulative value is readable off the next present row).

    Scale shape: one explode into a (term)-keyed min-agg (map-side
    partials; the shuffle moves one row per distinct term), a tiny
    bucket agg, and a window over <= n_buckets rows. Requires
    non-negative ids (crawl tables use BIGINT ids)."""
    from pyspark.sql import Window

    from walker_spark.operators.dedup import tokens

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda s: F.length(s) > 0)
        ).alias("term"),
    )
    firsts = toks.groupBy("term").agg(F.min("_id").alias("first_id"))
    mx = df.agg(F.max(F.col(id_col)).alias("_mx"))
    counts = (
        firsts.crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                f"CAST(first_id * {int(n_buckets)} div (_mx + 1) AS BIGINT)"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return counts.select(
        "bucket",
        "new_terms",
        F.sum("new_terms").over(w).cast("long").alias("cum_terms"),
    )
