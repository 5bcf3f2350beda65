"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The reference engine has no tokenizer surface; this closes the
training-data tier's last tokenizer gap — textstats.tokenize_ids
CONSUMES a vocabulary, this module TRAINS one (and segments a corpus
with it), over the same shared token normalizer (dedup.tokens).

Spark-first shape — the classic BPE trick, distributed:

- The corpus collapses ONCE to a word-frequency table (merges operate
  on distinct words weighted by count, never on corpus bytes), so per
  merge round the work is bounded by |vocab|, not corpus size. At
  100 TB the word table is millions of rows, still a small fraction
  of the corpus, and it stays fully distributed.
- Each round: (1) adjacent-pair counts — one map-side-combinable
  aggregation over the word table (transform(sequence(...)) pair
  projection); (2) the argmax pair becomes a driver literal (the
  k-means-codebook precedent: KB-sized by design, and the oracle
  needs the same literal unrolling); (3) the merge itself is a
  ZERO-EXCHANGE fold — aggregate(...) over the symbol array
  implementing CANONICAL greedy leftmost merging: the tail-symbol
  check ``acc = a OR endswith(acc, ' ' || a)`` is exact because
  symbols never contain spaces; (4) localCheckpoint of the new word
  table (pagerank's one-job-per-round rule).
- Ties on pair count break by max (count, left, right): Spark
  compares strings as UTF-8 bytes (UTF8String), which is DuckDB's
  binary collation, so the oracle's ORDER BY n DESC, a DESC, b DESC
  LIMIT 1 picks the identical pair.
- Encoding applies the trained merges to DISTINCT words once (the
  fold stack is one zero-exchange projection chain), then the corpus
  token stream joins the word→subwords map — broadcastable at real
  vocab sizes. Applying merges fully in rank order is equivalent to
  canonical priority-queue BPE encoding: a merge can only create
  symbols no EARLIER merge references, so earlier merges never become
  newly applicable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

#: Sennrich end-of-word marker — a single symbol, appended to every
#: word so word-final merges are distinct from word-internal ones.
END_MARKER = "</w>"

_MERGES_SCHEMA = (
    "merge_rank long, lhs string, rhs string, merged string, "
    "pair_count long"
)


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(a: str, b: str, sym_col: str = "sym") -> str:
    """Greedy leftmost merge of adjacent (a, b) in a symbol array as a
    single fold: the accumulator is the space-joined prefix; a merge
    appends b to the tail symbol WITHOUT a separator. Exact because
    symbols never contain spaces (the token normalizer splits on
    whitespace), so ``endswith(acc, ' ' || a)`` is true iff the tail
    symbol is exactly ``a``. Bit-identical to DuckDB list_reduce with
    the same lambda (the oracle relies on it)."""
    la, lb = _lit(a), _lit(b)
    return (
        f"split(aggregate(slice({sym_col}, 2, size({sym_col}) - 1), "
        f"{sym_col}[0], (acc, x) -> CASE WHEN x = {lb} AND "
        f"(acc = {la} OR endswith(acc, ' ' || {la})) "
        f"THEN acc || {lb} ELSE acc || ' ' || x END), ' ')"
    )


#: adjacent-pair projection over the symbol array. A fully-merged
#: word has ONE symbol — sequence(1, 0) flips descending under Spark
#: semantics and sym[i] would THROW under ANSI, so the access goes
#: through get() (NULL past the end) and the phantom pair filters out.
_PAIRS_EXPR = (
    "filter(transform(sequence(1, greatest(size(sym) - 1, 1)), "
    "i -> struct(get(sym, i - 1) AS a, get(sym, i) AS b)), "
    "p -> p.b IS NOT NULL AND p.a IS NOT NULL)"
)


@dataclass
class BpeModel:
    """Trained state: ``merges`` (merge_rank, lhs, rhs, merged,
    pair_count) and ``words`` — the FINAL word table (word, cnt, sym),
    i.e. the exact segmentation of every training word."""

    merges: DataFrame
    words: DataFrame


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, cnt, sym): ONE word-keyed exchange with
    map-side partial counts; sym is the code-point split plus the
    end-of-word marker. This is the only stage that reads corpus
    text — every merge round operates on this bounded table."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.concat(
                F.split("word", ""), F.array(F.lit(END_MARKER))
            ).alias("sym"),
        )
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> BpeModel:
    """Learn ``num_merges`` BPE merges; stops early when the best
    remaining pair's corpus count drops below ``min_pair_count``
    (merging hapax pairs is noise). Two jobs per round: the pair-count
    argmax (a one-row collect — a driver literal like the IVF
    codebooks) and the localCheckpoint of the merged word table."""
    spark = docs.sparkSession
    words = word_table(docs, text_col).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, num_merges + 1):
        top = (
            words.select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .agg(F.max(F.struct("n", "a", "b")).alias("m"))
            .select("m.*")
            .collect()
        )
        if not top or top[0]["n"] is None or top[0]["n"] < min_pair_count:
            break
        n, a, b = top[0]["n"], top[0]["a"], top[0]["b"]
        merges.append((rank, a, b, a + b, int(n)))
        words = words.withColumn(
            "sym", F.expr(_merge_expr(a, b))
        ).localCheckpoint()
    return BpeModel(
        merges=spark.createDataFrame(merges, _MERGES_SCHEMA), words=words
    )


def bpe_vocab(model: BpeModel) -> DataFrame:
    """Final subword vocabulary with exact corpus frequencies
    (token, n): one explode + one token-keyed aggregation over the
    bounded word table."""
    return (
        model.words.select(F.explode("sym").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment a corpus with a trained merge list → one row per
    subword occurrence: (id, pos, spos, token) where pos is the word
    index in the document and spos the subword index in the word.

    The merge list is tiny by construction (one row per learned
    merge) so it collects to driver literals; DISTINCT words segment
    once through the rank-ordered fold stack (zero exchanges after
    the distinct), and the corpus token stream joins the broadcast
    word→subwords map — corpus text never shuffles."""
    if isinstance(merges, DataFrame):
        rows = sorted(
            ((r["merge_rank"], r["lhs"], r["rhs"]) for r in merges.collect())
        )
    else:
        rows = [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    wordmap = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
        .select(
            "word",
            F.concat(
                F.split("word", ""), F.array(F.lit(END_MARKER))
            ).alias("sym"),
        )
    )
    for _, a, b in rows:
        wordmap = wordmap.withColumn("sym", F.expr(_merge_expr(a, b)))
    # positions index the FILTERED token array (empty tokens can only
    # arise from whole-empty docs under the trimming normalizer, but
    # filtering before posexplode makes the contract explicit)
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    stream = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(toks).alias("pos", "word"),
    )
    return (
        stream.join(F.broadcast(wordmap), "word")
        .select(
            "id",
            "pos",
            F.posexplode("sym").alias("spos", "token"),
        )
    )
