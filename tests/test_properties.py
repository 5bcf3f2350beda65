"""Property-based tests (hypothesis) for the parity-critical kernels
and the dispatcher quota invariants — the reference has no
property-based coverage (SURVEY §5); these pin the invariants its
golden tables only sample."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from walker_spark.functions import fnv, urlkernel
from walker_spark.operators import dispatch_core

# ---------------------------------------------------------------------------
# URL kernel
# ---------------------------------------------------------------------------

_path_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~!$&'()*+,;=:@/% ?#[]",
    max_size=40,
)


@given(
    host=st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,8}){0,2}\.(com|org|co\.uk)", fullmatch=True),
    path=_path_chars,
)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(host, path):
    """normalize(normalize(u)) == normalize(u): the stored canonical
    form must be a fixed point, else recrawls would re-key URLs."""
    u = f"http://{host}/{path}"
    once = urlkernel.normalize_url(u)
    if once is None:
        return
    twice = urlkernel.normalize_url(once)
    assert twice == once


@given(
    host=st.from_regex(r"[a-z]{1,8}\.(com|org|net|co\.uk)", fullmatch=True),
    path=st.from_regex(r"/[a-z0-9/._-]{0,30}", fullmatch=True),
    qkeys=st.lists(st.from_regex(r"[a-z]{1,5}", fullmatch=True), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_primary_key_roundtrip(host, path, qkeys):
    """url -> (dom, subdom, path, proto) -> url is stable under
    re-normalization (CreateURL inverse of PrimaryKey, url.go:29-44,
    210-228)."""
    q = "&".join(f"{k}={i}" for i, k in enumerate(qkeys))
    u = f"http://{host}{path}" + (f"?{q}" if q else "")
    norm = urlkernel.normalize_url(u)
    assert norm is not None
    key = urlkernel.primary_key(norm)
    assert key is not None
    rebuilt = urlkernel.url_from_key(*key)
    assert urlkernel.normalize_url(rebuilt) == norm


@given(data=st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_fnv_batch_matches_scalar(data):
    out = fnv.fnv1_64_batch([data, data, b"", data + b"x"])
    assert out[0] == fnv.fnv1_64(data)
    assert out[1] == out[0]
    assert out[2] == fnv.fnv1_64(b"")
    assert out[3] == fnv.fnv1_64(data + b"x")


# ---------------------------------------------------------------------------
# dispatcher quota invariants
# ---------------------------------------------------------------------------

_link_rows = st.lists(
    st.tuples(
        st.sampled_from(["", "www", "m"]),                        # subdom
        st.from_regex(r"/[a-z]{1,6}\.html", fullmatch=True),      # path
        st.just("http"),
        st.sampled_from([0, 0, 0, 10_000, 25_000, 99_000]),       # time_ms
        st.booleans(),                                            # getnow
        st.sampled_from([None, 1, 2]),                            # fnv_txt
    ),
    max_size=60,
)


@given(rows=_link_rows, limit=st.integers(1, 12), refresh=st.sampled_from([0.0, 25.0, 33.0, 100.0]))
@settings(max_examples=300, deadline=None)
def test_select_segment_invariants(rows, limit, refresh):
    """For ANY frontier state: the dispatch list never exceeds the
    segment limit; getnow links lead (up to the limit); selected keys
    collapse to unique URLs; counts match the input
    (dispatcher.go:867-994 invariants)."""
    # dedupe to latest-per-URL like the Spark stage feeding the core,
    # and present rows in clustering order
    latest: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3])):
        latest[(r[0], r[1], r[2])] = r
    ordered = sorted(latest.values(), key=lambda r: (r[0], r[1], r[2]))

    sel, tot, uncrawled = dispatch_core.select_segment(
        "t.com", ordered, limit, refresh, min_link_refresh_ms=0, now_ms=100_000
    )
    assert tot == len(ordered)
    assert uncrawled == sum(1 for r in ordered if r[3] == 0)
    assert len(sel) <= limit

    n_getnow = sum(1 for r in ordered if r[4])
    lead = sel[: min(n_getnow, limit)]
    getnow_keys = {(r[0], r[1], r[2]) for r in ordered if r[4]}
    assert all((s, p, pr) in getnow_keys for (s, p, pr, _) in lead)

    # post-collapse (keep-last) keys are unique by construction
    collapsed = {}
    for s, p, pr, t in sel:
        collapsed[(s, p, pr)] = t
    assert len(collapsed) <= limit


@given(n_un=st.integers(0, 30), n_cr=st.integers(0, 30), limit=st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_quota_split_without_interference(n_un, n_cr, limit):
    """With disjoint URLs and no param-dedup interference, the split is
    exactly idealUncrawled = numRemain - round(refresh% * numRemain)
    with backfill (dispatcher_test.go MultipleLinksTest arithmetic,
    generalized)."""
    rows = [("", f"/u{i:03d}.html", "http", 0, False, None) for i in range(n_un)]
    rows += [("", f"/c{i:03d}.html", "http", 1000 + i, False, 7000 + i) for i in range(n_cr)]
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    sel, _, _ = dispatch_core.select_segment(
        "t.com", rows, limit, 33.0, 0, 10_000_000
    )
    ideal_cr = dispatch_core.go_round(0.33 * limit)
    ideal_un = limit - ideal_cr
    got_un = sum(1 for s in sel if s[1].startswith("/u"))
    got_cr = sum(1 for s in sel if s[1].startswith("/c"))
    assert got_un + got_cr == min(limit, n_un + n_cr)
    # quota honored when both lists can fill their shares
    if n_un >= ideal_un and n_cr >= ideal_cr:
        assert got_un == ideal_un and got_cr == ideal_cr
