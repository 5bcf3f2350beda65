"""BPE trainer/encoder vs a pure-Python reference implementation of
Sennrich et al. 2016 (greedy leftmost merge, (count, lhs, rhs) max
tiebreak), randomized corpora + hand-built edge cases."""

from __future__ import annotations

import random
from collections import Counter

from walker_spark.operators.bpe import (
    END_MARKER,
    bpe_encode,
    bpe_train,
    bpe_vocab,
)

# ---------------------------------------------------------------------------
# pure-Python reference
# ---------------------------------------------------------------------------


def _merge(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def ref_bpe(texts, num_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    state = {tuple(w) + (END_MARKER,): c for w, c in words.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for sym, c in state.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), n = max(
            pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((rank, a, b, a + b, n))
        nxt = Counter()
        for sym, c in state.items():
            nxt[_merge(sym, a, b)] += c
        state = dict(nxt)
    vocab = Counter()
    for sym, c in state.items():
        for s in sym:
            vocab[s] += c
    return merges, dict(vocab), state


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_bpe_train_matches_reference_randomized(spark):
    rng = random.Random(0xBEE)
    vocab = ["lo", "low", "lower", "lowest", "newer", "wider", "new", "ooo"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(40)
    ]
    model = bpe_train(_docs(spark, texts), num_merges=10)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in model.merges.orderBy("merge_rank").collect()
    ]
    want, want_vocab, _ = ref_bpe(texts, 10)
    assert got == want
    got_vocab = {r["token"]: r["n"] for r in bpe_vocab(model).collect()}
    assert got_vocab == want_vocab


def test_bpe_greedy_leftmost_and_tiebreak(spark):
    # 'ooo' exercises the overlapping-run rule: (o,o) merges leftmost
    # pairs only -> oo + o; ties on count break by max (lhs, rhs)
    texts = ["ooo ooo", "ab ab"]
    model = bpe_train(_docs(spark, texts), num_merges=2, min_pair_count=1)
    got = [
        (r["lhs"], r["rhs"], r["pair_count"])
        for r in model.merges.orderBy("merge_rank").collect()
    ]
    want, _, _ = ref_bpe(texts, 2, min_pair_count=1)
    assert got == [(a, b, n) for _, a, b, _, n in want]
    # the run word segments as [oo, o, marker]-derived subwords
    syms = {
        r["word"]: r["sym"] for r in model.words.collect()
    }
    assert syms["ooo"][0].startswith("oo")


def test_bpe_early_stop_on_min_count(spark):
    # every pair is a hapax -> zero merges at the default threshold
    model = bpe_train(_docs(spark, ["abc"]), num_merges=5)
    assert model.merges.count() == 0
    # threshold 1 learns merges
    model1 = bpe_train(_docs(spark, ["abc"]), num_merges=5, min_pair_count=1)
    assert model1.merges.count() > 0


def test_bpe_encode_matches_trained_state(spark):
    rng = random.Random(7)
    vocab = ["hug", "hugs", "hugger", "pug", "pun", "bun", "hugging"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
        for _ in range(25)
    ]
    docs = _docs(spark, texts)
    model = bpe_train(docs, num_merges=6, min_pair_count=1)
    # encoding the training corpus must reproduce the final word-table
    # segmentation exactly, word for word
    seg = {r["word"]: list(r["sym"]) for r in model.words.collect()}
    enc = bpe_encode(docs, model.merges).collect()
    by_word = {}
    for r in enc:
        by_word.setdefault((r["id"], r["pos"]), []).append(
            (r["spos"], r["token"])
        )
    for (i, pos), toks in by_word.items():
        word = texts[i].split()[pos]
        assert [t for _, t in sorted(toks)] == seg[word], (word, toks)
    # stream covers every token occurrence of every doc
    n_words = sum(len(t.split()) for t in texts)
    assert len(by_word) == n_words
