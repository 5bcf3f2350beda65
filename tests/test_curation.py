"""Corpus-curation operators (walker_spark/operators/curation.py):
deterministic sampling, mix capping, sequence packing, benchmark
decontamination. Semantics gated here; cross-engine value parity is
gated by the driver oracles in __spark_entry__."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walker_spark.operators.curation import (
    cap_per_source,
    contaminated_docs,
    contamination_spans,
    cut_spans,
    deterministic_sample,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"tok{i % 5} " * (10 + i % 7) + "shared phrase four tokens", f"src{i % 3}")
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_sample_deterministic_and_partition_invariant(docs):
    s1 = {r["id"] for r in deterministic_sample(docs, 0.3).collect()}
    s2 = {r["id"] for r in deterministic_sample(docs.repartition(7), 0.3).collect()}
    assert s1 == s2  # partitioning cannot change the sample
    assert 0.1 < len(s1) / 200 < 0.5  # rate is approximately honored
    # monotone: a larger rate strictly contains a smaller one
    s3 = {r["id"] for r in deterministic_sample(docs, 0.6).collect()}
    assert s1 <= s3


def test_cap_per_source_bounds_and_keeps_smallest(docs):
    out = cap_per_source(docs, k=10).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r["id"])
    assert all(len(ids) == 10 for ids in per_src.values())
    # smallest ids win: src0 holds doc_ids 0,3,6,...
    assert sorted(per_src["src0"]) == [3 * i for i in range(10)]


def test_pack_sequences_budget(docs):
    out = pack_sequences(docs, budget_tokens=64).collect()
    # pack ids are contiguous from 0 per source, and every pack except
    # possibly the last holds >= budget tokens once its overflow doc is
    # counted (best-effort contiguous fill)
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["id"])
        packs = sorted({r["pack_id"] for r in rows})
        assert packs == list(range(len(packs)))
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 64
            cum += r["n_tokens"]


def test_contaminated_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "alpha beta gamma delta nine ten"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta yy")], "doc_id long, text string"
    )
    hit = {r["id"] for r in contaminated_docs(corpus, bench, ngram=4).collect()}
    assert hit == {1, 3}  # both share the 4-gram "alpha beta gamma delta"


def test_contamination_spans_and_cut(spark):
    """Sequence-level decontamination: the planted benchmark leak is
    located as an exact token span and cut, keeping the document."""
    corpus = spark.createDataFrame(
        [
            # leak "one two three four" planted at positions 3-6
            (1, "aa bb cc ONE two three FOUR dd ee"),
            (2, "totally clean document with original content only"),
            # back-to-back leaks merge into one span [0, 8)
            (3, "one two three four one two three four tail"),
            (4, ""),  # unshingleable doc passes through
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix one two three four suffix")], "doc_id long, text string"
    )
    spans = contamination_spans(corpus, bench, ngram=4)
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in spans.collect()}
    assert got == {(1, 3, 7, 4), (3, 0, 8, 8)}

    cut = {r.doc_id: (r.text, r.removed_tokens) for r in cut_spans(corpus, spans).collect()}
    assert cut[1] == ("aa bb cc dd ee", 4)
    assert cut[2] == ("totally clean document with original content only", 0)
    assert cut[3] == ("tail", 8)
    assert cut[4] == ("", 0)
    # the cut output is genuinely decontaminated: zero spans remain
    cleaned = spark.createDataFrame(
        [(k, v[0]) for k, v in cut.items()], "doc_id long, text string"
    )
    assert contamination_spans(cleaned, bench, ngram=4).isEmpty()


def test_temperature_mix_reweights_and_clamps(spark):
    """Head source down-weighted toward n^alpha, tail sources boosted
    (keep probability clamps at 1 so tiny sources are kept whole);
    membership is deterministic under repartitioning."""
    from walker_spark.operators.curation import temperature_mix

    rows = [(i, "text", "head" if i < 900 else f"tail{i % 4}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    kept = temperature_mix(df, budget_docs=300, alpha=0.5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["id"])

    # tail sources: n=25 each, p = 300 * 5 / (30 + 4*5) / 25 = 1.2 -> clamped
    # to 1, so every tail row is kept
    for s in ("tail0", "tail1", "tail2", "tail3"):
        assert len(by_src[s]) == 25, s
    # head: p = 300 * 30 / 50 / 900 = 0.2 -> ~180 of 900 kept, far below
    # its 90% share of the corpus
    assert 90 <= len(by_src["head"]) <= 290

    kept2 = temperature_mix(df.repartition(13), budget_docs=300, alpha=0.5).collect()
    assert {(r["id"], r["source"]) for r in kept} == {
        (r["id"], r["source"]) for r in kept2
    }

    # alpha=1 degenerates to uniform keep probability across sources
    uni = temperature_mix(df, budget_docs=300, alpha=1.0).collect()
    ids = {r["id"] for r in uni}
    assert 200 <= len(ids) <= 400


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR: raw docs written in the target's vocabulary out-score
    docs from a disjoint vocabulary; selection is deterministic under
    repartitioning (md5-derived features and Gumbel noise)."""
    from walker_spark.operators.curation import dsir_select

    a_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    b_words = ["zork", "quux", "grue", "frotz", "plugh", "xyzzy"]

    def phrase(words, i, n=40):
        return " ".join(words[(i * 7 + j) % len(words)] for j in range(n))

    target = spark.createDataFrame(
        [(1000 + i, phrase(a_words, i)) for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, phrase(a_words, i)) for i in range(100)]
        + [(100 + i, phrase(b_words, i)) for i in range(100)],
        "doc_id long, text string",
    )

    picked = dsir_select(raw, target, k=30, buckets=256).collect()
    assert len(picked) == 30
    from_target_vocab = sum(1 for r in picked if r["id"] < 100)
    assert from_target_vocab >= 27, picked

    picked2 = dsir_select(raw.repartition(9), target, k=30, buckets=256).collect()
    assert [(r["id"], r["dsir_score"]) for r in picked] == [
        (r["id"], r["dsir_score"]) for r in picked2
    ]


def test_assign_shards_matches_sequential_prefix_sum(spark):
    """The distributed weighted prefix sum (range exchange + broadcast
    offsets + local windows) must reproduce the single-threaded
    cumulative shard assignment for any partition count, including
    empty docs (0 tokens share the boundary doc's shard)."""
    from walker_spark.operators.curation import assign_shards

    rows = []
    for i in range(97):
        n = (i * 7) % 13  # 0..12 tokens, includes empties
        rows.append((i, " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    expect, cum = {}, 0
    for i, text in rows:
        n = len(text.split()) if text.strip() else 0
        expect[i] = (n, cum // 40)
        cum += n

    for p in (1, 5, 16):
        got = {
            r["id"]: (r["n_tokens"], r["shard_id"])
            for r in assign_shards(df, shard_tokens=40, partitions=p).collect()
        }
        assert got == expect, p


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------


def _py_es_sample(rows, k):
    """rows: (group, id, weight). Returns {group: [(id, weight, key, rn)]}"""
    import hashlib
    import math

    out = {}
    for g, i, w in rows:
        if w <= 0:
            continue
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) / (1 << 32)
        out.setdefault(g, []).append((i, w, round(math.log(u) / float(w), 6)))
    res = {}
    for g, lst in out.items():
        lst.sort(key=lambda x: (-x[2], x[0]))
        res[g] = [(i, w, key, r + 1) for r, (i, w, key) in enumerate(lst[:k])]
    return res


def test_weighted_sample_random_parity(spark):
    import random

    from walker_spark.operators.curation import weighted_sample

    rng = random.Random(61)
    rows = [
        (f"s{rng.randint(0, 3)}", i, rng.randint(-5, 500))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    got = {}
    for r in weighted_sample(
        df, k=7, weight_col="w", group_cols=["source"], id_col="doc_id",
        salt_shards=8,
    ).collect():
        got.setdefault(r["source"], []).append(
            (r["id"], r["weight"], r["es_key"], r["rn"])
        )
    for g in got:
        got[g].sort(key=lambda x: x[3])
    assert got == _py_es_sample(rows, 7)


def test_weighted_sample_prefers_heavy_rows(spark):
    from walker_spark.operators.curation import weighted_sample

    # one row carries ~all the mass: it must be sampled first
    rows = [(i, 1) for i in range(50)] + [(99, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    top = weighted_sample(df, k=1, weight_col="w", id_col="doc_id").collect()
    assert len(top) == 1 and top[0]["id"] == 99

    # zero/negative weights never appear
    rows2 = [(1, 0), (2, -3), (3, 5)]
    df2 = spark.createDataFrame(rows2, "doc_id long, w long")
    got = {r["id"] for r in weighted_sample(df2, k=3, weight_col="w", id_col="doc_id").collect()}
    assert got == {3}


def test_corpus_report_counts_dups_tokens_and_verdicts(spark):
    from walker_spark.operators.curation import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "a"),   # 3 tokens
            (2, "alpha beta gamma", "a"),   # exact dup of 1 (same source)
            (3, "  ", "a"),                 # whitespace-only: 0 tokens
            (4, "alpha beta gamma", "b"),   # cross-source copy: dup too
            (5, "unique text", "b"),        # 2 tokens
        ],
        "doc_id long, text string, source string",
    )
    verdicts = spark.createDataFrame(
        [(1, True), (2, False), (3, False), (4, True), (5, True)],
        "id long, quality_pass boolean",
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_tokens"],
            r["n_exact_dup_docs"],
            r["n_quality_pass"],
        )
        for r in corpus_report(docs, verdicts).collect()
    }
    assert got == {"a": (3, 6, 2, 1), "b": (2, 5, 1, 2)}


def test_grouped_split_groups_never_straddle(spark):
    from walker_spark.operators.curation import grouped_split

    rows = [(i, f"host{i % 17}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = grouped_split(df).collect()
    assert len(out) == 300
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # leakage-safe
    names = {r["split"] for r in out}
    assert names <= {"train", "val", "test"}

    # deterministic across reruns / parallelism
    again = {(r["id"], r["split"]) for r in grouped_split(df.repartition(7)).collect()}
    assert again == {(r["id"], r["split"]) for r in out}


def test_grouped_split_thresholds_match_python(spark):
    import hashlib

    from walker_spark.operators.curation import grouped_split

    fr = (("a", 0.5), ("b", 0.3), ("c", 0.2))
    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(200)], "doc_id long, source string"
    )
    got = {r["group"]: r["split"] for r in grouped_split(df, fractions=fr).collect()}

    t1 = int(0.5 * (1 << 32))
    t2 = int(0.8 * (1 << 32))
    for g, split in got.items():
        u = int(hashlib.md5(f"split:{g}".encode()).hexdigest()[:8], 16)
        assert split == ("a" if u < t1 else "b" if u < t2 else "c")
    assert len(set(got.values())) == 3  # all three splits hit at n=200


def test_grouped_split_rejects_bad_fractions(spark):
    from walker_spark.operators.curation import grouped_split

    df = spark.createDataFrame([(1, "x")], "doc_id long, source string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        grouped_split(df, fractions=(("a", 0.5), ("b", 0.4)))


def test_threshold_sweep_hand_and_random(spark):
    import random

    from walker_spark.operators.curation import threshold_sweep

    df = spark.createDataFrame(
        [(1, 7), (5, 3), (10, 2), (20, 4)], "score long, w long"
    )
    got = {
        r["threshold"]: (r["docs"], r["weight"], r["docs_ppm"], r["weight_ppm"])
        for r in threshold_sweep(
            df, "score", [15, 5, 10], weight_col="w"  # unsorted input
        ).collect()
    }
    # totals: 4 docs, weight 16
    assert got[5] == (3, 9, 750000, 562500)
    assert got[10] == (2, 6, 500000, 375000)
    assert got[15] == (1, 4, 250000, 250000)

    rng = random.Random(0x5E)
    rows = [(rng.randint(0, 100), rng.randint(1, 9)) for _ in range(300)]
    ths = [10, 33, 50, 90]
    got2 = {
        r["threshold"]: (r["docs"], r["weight"])
        for r in threshold_sweep(
            spark.createDataFrame(rows, "score long, w long"),
            "score",
            ths,
            weight_col="w",
        ).collect()
    }
    for t in ths:
        want = [r for r in rows if r[0] >= t]
        assert got2[t] == (len(want), sum(w for _, w in want))

    # default weight = 1 per doc
    got3 = {
        r["threshold"]: r["weight"]
        for r in threshold_sweep(
            spark.createDataFrame(rows, "score long, w long"), "score", ths
        ).collect()
    }
    for t in ths:
        assert got3[t] == sum(1 for r in rows if r[0] >= t)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        threshold_sweep(df, "score", [])


def test_semantic_decontaminate_vs_brute(spark):
    import math
    import random

    from walker_spark.operators.curation import semantic_decontaminate
    from walker_spark.operators.similarity import ivf_sample_centroids

    rng = random.Random(0xDECA)
    dim = 8

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    bench_rows = [(i, vec()) for i in range(0, 12)]
    corpus_rows = [(100 + i, vec()) for i in range(60)]
    # plant an exact leak: corpus 199 == bench 3's vector
    corpus_rows.append((199, list(bench_rows[3][1])))
    schema = "vec_id long, embedding array<double>"
    bench = spark.createDataFrame(bench_rows, schema)
    corpus = spark.createDataFrame(corpus_rows, schema)

    got = {
        r["id"]: (r["bench_id"], r["cosine"], r["contaminated"])
        for r in semantic_decontaminate(
            corpus, bench, threshold=0.95, n_centroids=4
        ).collect()
    }

    # python reference with the same blocking
    cents = ivf_sample_centroids(bench, 4)

    def cell(v):
        d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        return d.index(min(d))

    bcell = {}
    for bid, bv in bench_rows:
        bcell.setdefault(cell(bv), []).append((bid, bv))

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 3)

    for cid_, cv_ in corpus_rows:
        items = bcell.get(cell(cv_), [])
        if not items:
            want = (-1, -1.0, 0)
        else:
            c, b = max(
                (cos(cv_, bv), bid) for bid, bv in items
            )
            want = (b, c, int(c >= 0.95))
        assert got[cid_] == want, (cid_, got[cid_], want)

    # the planted leak is flagged iff it shares the bench item's cell
    # (same vector -> same cell by construction)
    assert got[199][0] == 3 and got[199][2] == 1


def test_k_anonymity_classes_and_report(spark):
    import pytest as _pytest

    from walker_spark.operators.curation import (
        k_anonymity_classes,
        k_anonymity_report,
    )

    rows = (
        [("en", "a") for _ in range(5)]
        + [("en", "b") for _ in range(2)]
        + [("fr", "a")]
    )
    df = spark.createDataFrame(rows, "lang string, src string")
    cls = {
        (r["lang"], r["src"]): (r["class_n"], r["at_risk"])
        for r in k_anonymity_classes(df, ["lang", "src"], k=3).collect()
    }
    assert cls == {
        ("en", "a"): (5, False),
        ("en", "b"): (2, True),
        ("fr", "a"): (1, True),
    }
    rep = k_anonymity_report(df, ["lang", "src"], k=3).collect()[0]
    assert (
        rep["n_rows"],
        rep["n_classes"],
        rep["risky_classes"],
        rep["risky_rows"],
        rep["risky_ppm"],
    ) == (8, 3, 2, 3, 3 * 1_000_000 // 8)
    with _pytest.raises(ValueError):
        k_anonymity_classes(df, ["lang"], k=1)
    with _pytest.raises(ValueError):
        k_anonymity_classes(df, [], k=3)


def test_matched_sample_quotas_and_determinism(spark):
    import hashlib

    import pytest as _pytest

    from walker_spark.operators.curation import matched_sample

    # corpus skewed toward bucket 0; target skewed toward bucket 1
    corpus = spark.createDataFrame(
        [(i, 0) for i in range(80)] + [(100 + i, 1) for i in range(20)]
        + [(200 + i, 2) for i in range(10)],
        "doc_id long, bucket long",
    )
    target = spark.createDataFrame(
        [(0,)] * 10 + [(1,)] * 30 + [(3,)] * 10, "bucket long"
    )
    out = matched_sample(corpus, target, n_total=50, id_col="doc_id")
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # quotas: floor(50 * t/T): b0 -> 10, b1 -> 30, b3 -> 10 (absent in
    # corpus -> nothing); corpus b2 absent from target -> nothing
    assert set(by_bucket) == {0, 1}
    assert len(by_bucket[0]) == 10 and all(r["quota"] == 10 for r in by_bucket[0])
    # bucket 1: quota 30 capped by availability 20
    assert len(by_bucket[1]) == 20 and all(r["quota"] == 30 for r in by_bucket[1])
    assert all(r["avail"] == 20 for r in by_bucket[1])
    # kept = md5-order smallest: replay in python
    keep0 = sorted(
        range(80),
        key=lambda i: (hashlib.md5(f"match{i}".encode()).hexdigest(), i),
    )[:10]
    assert sorted(r["doc_id"] for r in by_bucket[0]) == sorted(keep0)
    # determinism across a different shuffle partitioning
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            (r["doc_id"], r["rank"])
            for r in matched_sample(corpus, target, n_total=50).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert again == {(r["doc_id"], r["rank"]) for r in rows}
    with _pytest.raises(ValueError):
        matched_sample(corpus, target, n_total=0)
