"""Golden tests for the URL kernel.

Cases translated from the reference's own unit tests
(url_test.go:17-57) plus Go net/url / purell behavior checks.
"""

import pytest

from walker_spark.functions import psl
from walker_spark.functions.urlkernel import (
    encode_query,
    normalize_url,
    parse_query,
    parse_url,
    primary_key,
    resolve,
    url_from_key,
)

# url_test.go:17-57 uses PurgeSidList = [jsessionid, phpsessid]
SIDS = ("jsessionid", "phpsessid")

GOLDEN = [
    ("UpCase", "HTTP://A.com/page1.com", "http://a.com/page1.com"),
    ("Fragment", "http://a.com/page1.com#Fragment", "http://a.com/page1.com"),
    ("PathSID", "http://a.com/page1.com;jsEssIoniD=436100313FAFBBB9B4DC8BA3C2EC267B",
     "http://a.com/page1.com"),
    ("PathSID2", "http://a.com/page1.com;phPseSsId=436100313FAFBBB9B4DC8BA3C2EC267B",
     "http://a.com/page1.com"),
    ("QuerySID", "http://a.com/page1.com?foo=bar&jsessionID=436100313FAFBBB9B4DC8BA3C2EC267B&baz=niffler",
     "http://a.com/page1.com?baz=niffler&foo=bar"),
    ("QuerySID2", "http://a.com/page1.com?PHPSESSID=436100313FAFBBB9B4DC8BA3C2EC267B",
     "http://a.com/page1.com"),
    ("EmbeddedPort", "http://a.com:8080/page1.com", "http://a.com:8080/page1.com"),
]


@pytest.mark.parametrize("tag,inp,expect", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_normalize_golden(tag, inp, expect):
    assert normalize_url(inp, SIDS) == expect


def test_purell_safe_flags():
    # default port removal (http:80 / https:443 only)
    assert normalize_url("http://a.com:80/x") == "http://a.com/x"
    assert normalize_url("https://a.com:443/x") == "https://a.com/x"
    assert normalize_url("https://a.com:80/x") == "https://a.com:80/x"
    # uppercase escapes + decode-unnecessary escapes: vintage (pre-1.5)
    # Go net/url has no RawPath — Path is stored decoded and String()
    # re-escapes with Go's rules, so %7e -> ~, %2f -> /, %3f -> %3F.
    assert normalize_url("http://a.com/%7euser/%2fx%3f") == "http://a.com/~user//x%3F"


def test_escape_roundtrip_go_rules():
    # Go path escaping keeps $&+,/:;=@ and encodes space, <>, ?, #
    # (Go Values.Encode writes bare keys as "d=")
    assert normalize_url("http://a.com/a b<c>?d#e") == "http://a.com/a%20b%3Cc%3E?d="
    # ';sid=' only stripped when a configured sid follows
    assert normalize_url("http://a.com/x;other=1", SIDS) == "http://a.com/x;other=1"


def test_query_reencode_sorts_and_plus():
    assert normalize_url("http://a.com/?b=2&a=1") == "http://a.com/?a=1&b=2"
    # '+' means space in query; re-encoded as '+'
    assert normalize_url("http://a.com/?q=a+b") == "http://a.com/?q=a+b"
    # semicolon separators (2014-vintage Go ParseQuery)
    assert normalize_url("http://a.com/?a=1;b=2") == "http://a.com/?a=1&b=2"
    # multi-valued keys keep value order
    assert normalize_url("http://a.com/?x=2&x=1&a=0") == "http://a.com/?a=0&x=2&x=1"


def test_invalid_escape_fails_parse():
    assert normalize_url("http://a.com/%zz") is None
    # invalid escape in query drops only that pair (Go ParseQuery)
    assert normalize_url("http://a.com/x?ok=1&bad=%zz") == "http://a.com/x?ok=1"


def test_parse_query_encode():
    assert parse_query("a=1&b=%20x&c") == [("a", "1"), ("b", " x"), ("c", "")]
    assert encode_query([("b", "2"), ("a", "1 ")]) == "a=1+&b=2"


def test_psl():
    assert psl.tld_plus_one("www.bbc.co.uk") == "bbc.co.uk"
    assert psl.subdomain("www.bbc.co.uk") == "www"
    assert psl.tld_plus_one("bbc.co.uk") == "bbc.co.uk"
    assert psl.subdomain("bbc.co.uk") == ""
    assert psl.tld_plus_one("a.b.c.test.com") == "test.com"
    assert psl.subdomain("a.b.c.test.com") == "a.b.c"
    assert psl.tld_plus_one("com") is None  # host == suffix: error in Go
    assert psl.tld_plus_one("") is None


def test_primary_key():
    # (dom, subdom, path=RequestURI incl. query, proto) — url.go:210-228
    assert primary_key("http://www.a.com/p?x=1") == ("a.com", "www", "/p?x=1", "http")
    assert primary_key("https://b.co.uk") == ("b.co.uk", "", "/", "https")
    assert primary_key("http://localhost/x") is None  # no eTLD+1


def test_url_from_key():
    # CreateURL semantics (url.go:29-44)
    assert url_from_key("a.com", "www", "/p?x=1", "http") == "http://www.a.com/p?x=1"
    assert url_from_key("a.com", "", "/", "http") == "http://a.com/"
    assert url_from_key("a.com", "www.", "p", "http") == "http://www.a.com/p"


def test_resolve():
    assert resolve("http://a.com/dir/page.html", "page2.html") == "http://a.com/dir/page2.html"
    assert resolve("http://a.com/dir/page.html", "/abs.html") == "http://a.com/abs.html"
    assert resolve("http://a.com/dir/", "//b.com/x") == "http://b.com/x"
    assert resolve("http://a.com/dir/", "http://c.com/y") == "http://c.com/y"


def test_relative_urls_normalize():
    # parser normalizes hrefs before resolution; relative refs must survive
    assert normalize_url("page2.html") == "page2.html"
    assert normalize_url("/dir/page2.html#frag") == "/dir/page2.html"
