"""Content-defined chunking: pure-Python parity, reconstruction,
the edit-locality property (the reason CDC exists: a prefix edit
leaves downstream chunk keys intact), and the dedup-stats law."""

import hashlib


def _py_chunks(text, w, div):
    L = len(text)
    cuts = [1]
    for i in range(1, max(L - w, 0) + 1):
        h = int(hashlib.md5(text[i - 1 : i - 1 + w].encode()).hexdigest()[:8], 16)
        if h % div == 0:
            cuts.append(i + w)
    cuts.append(L + 1)
    out = []
    for j in range(len(cuts) - 1):
        s, e = cuts[j], cuts[j + 1]
        chunk = text[s - 1 : e - 1]
        out.append((j, s, e - s, hashlib.md5(chunk.encode()).hexdigest()))
    return out


def test_cdc_chunks_python_parity_and_reconstruction(spark):
    import random

    from walker_spark.operators.dedup import cdc_chunks

    rng = random.Random(17)
    docs = [
        (i, "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 300))))
        for i in range(30)
    ] + [(30, "tiny")]  # shorter than the window: one chunk
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, window=8, divisor=16).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["n_chars"], r["chunk_key"])
        )
    for i, text in docs:
        assert sorted(got[i]) == _py_chunks(text, 8, 16), i
        # chunks tile the document exactly
        spans = sorted(got[i])
        assert spans[0][1] == 1
        assert sum(n for _, _, n, _ in spans) == len(text)


def test_cdc_edit_locality_and_stats(spark):
    from walker_spark.operators.dedup import cdc_chunks, cdc_dedup_stats

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = "XX " + base  # prefix insertion
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    ch = cdc_chunks(df, window=8, divisor=16)
    rows = ch.collect()
    keys1 = {r["chunk_key"] for r in rows if r["id"] == 1}
    keys2 = {r["chunk_key"] for r in rows if r["id"] == 2}
    # content-defined boundaries resynchronize after the edit: most of
    # doc 1's chunks survive verbatim in doc 2 (fixed-size blocks
    # would share none)
    assert len(keys1 & keys2) >= len(keys1) - 2

    st = cdc_dedup_stats(ch).collect()[0]
    n_chunks = len(rows)
    n_distinct = len({r["chunk_key"] for r in rows})
    assert st["n_chunks"] == n_chunks
    assert st["n_distinct_chunks"] == n_distinct
    assert st["total_chars"] == len(base) + len(edited)
    assert st["saved_chars"] == st["total_chars"] - st["distinct_chars"]
    assert st["saved_chars"] > 0
