"""Per-file Bloom index (layout.file_blooms/bloom_prune): exact bit
parity with a pure-Python reference, the no-false-negative planner
guarantee, FP replay, and OR-law mergeability under compaction."""

import hashlib


def _py_positions(v, m, k):
    return {
        int(hashlib.md5(f"{v}:{j}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    }


def test_file_blooms_exact_bits_prune_law_and_merge(spark):
    from walker_spark.operators.layout import bloom_prune, file_blooms

    m, k = 128, 3
    rows = [(i % 7, f"u{(i * 13) % 29}") for i in range(200)]
    df = spark.createDataFrame(rows, "file long, v string")
    blooms = file_blooms(df, "file", "v", m_bits=m, k=k)

    got = {(r["file"], r["bit"]) for r in blooms.collect()}
    exp = {(f, b) for f, v in rows for b in _py_positions(v, m, k)}
    assert got == exp

    pyblooms = {}
    for f, v in rows:
        pyblooms.setdefault(f, set()).update(_py_positions(v, m, k))

    probes = spark.createDataFrame(
        [("u0",), ("u13",), ("never-inserted",)], "key string"
    )
    pruned = bloom_prune(blooms, probes, value_col="key", m_bits=m, k=k).collect()
    # one row per (file, key), every law exact: must_scan == "all k
    # positions present" — which implies no false negative
    assert len(pruned) == 7 * 3
    present = {(f, v) for f, v in rows}
    for r in pruned:
        expect = int(_py_positions(r["key"], m, k) <= pyblooms[r["file"]])
        assert r["must_scan"] == expect
        if (r["file"], r["key"]) in present:
            assert r["must_scan"] == 1

    # OR-law: compacting files 0+1 into one file == UNION-DISTINCT of
    # their bloom rows (rewrite maintenance never rescans data)
    merged_rows = [(0, v) for f, v in rows if f in (0, 1)]
    direct = {
        r["bit"]
        for r in file_blooms(
            spark.createDataFrame(merged_rows, "file long, v string"),
            "file",
            "v",
            m_bits=m,
            k=k,
        ).collect()
    }
    unioned = {b for f, bits in pyblooms.items() if f in (0, 1) for b in bits}
    assert direct == unioned
