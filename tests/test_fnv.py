"""FNV-1/64 fingerprint goldens (reference: fetcher.go:585-589;
golden fixture fetcher_test.go:1255-1344)."""

import numpy as np

from walker_spark.functions.fnv import FNV_OFFSET, fnv1_64, fnv1_64_batch

# Published FNV-1 (not 1a) 64-bit test vectors (Landon Curt Noll).
KNOWN = [
    (b"", 0xCBF29CE484222325),
    (b"a", 0xAF63BD4C8601B7BE),
    (b"b", 0xAF63BD4C8601B7BD),
    (b"foobar", 0x340D8765A4DDA9C2),
]


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def test_known_vectors():
    for data, expect in KNOWN:
        assert fnv1_64(data) == _signed(expect), data


def test_multiply_before_xor():
    # FNV-1 vs FNV-1a differ on any nonempty input; guard the order.
    h = ((FNV_OFFSET * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF) ^ ord("a")
    assert fnv1_64(b"a") == _signed(h)


# The reference's fingerprint fixture (fetcher_test.go:1256-1266):
FIXTURE_HTML = """<!DOCTYPE html>
<html>
<head>
<meta http-equiv="Content-Type" content="text/html; charset=utf-8">
<title>No Links</title>
</head>
<div>
\tRoses are red, violets are blue, golang is the bomb, aint it so true!
</div>
</html>"""
FIXTURE_TEXT = "No Links\n\nRoses are red, violets are blue, golang is the bomb, aint it so true!"


def test_fixture_body_and_text_fingerprints_consistent():
    fp = fnv1_64(FIXTURE_HTML.encode())
    fp_txt = fnv1_64(FIXTURE_TEXT.encode())
    assert fp != fp_txt
    got = fnv1_64_batch([FIXTURE_HTML, FIXTURE_TEXT])
    assert list(got) == [fp, fp_txt]


def test_batch_matches_scalar_random():
    rng = np.random.default_rng(42)
    vals = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)) for n in rng.integers(0, 300, 64)]
    vals += [b"", None, b"x" * 5000]
    got = fnv1_64_batch(vals, chunk_rows=7)
    want = [fnv1_64(v if v is not None else b"") for v in vals]
    assert list(got) == want
