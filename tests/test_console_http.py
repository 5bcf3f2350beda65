"""HTTP console route surface (reference console/controllers.go:32-50,
rest.go:23-28, lifecycle.go Start/Stop): a live ThreadingHTTPServer over
a fixture store, driven through real HTTP requests."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from tests.crawlfix import build_store, days_ago, domain_row, link_row
from walker_spark.operators.console_http import make_server


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    domains = [domain_row(d) for d in ("a.com", "b.com", "c.com")]
    links = [
        link_row("http://a.com/p1.html", days_ago(1), 200),
        link_row("http://a.com/p1.html", days_ago(3), 200),
        link_row("http://a.com/p2.html"),
        link_row("http://www.a.com/p3.html"),
        link_row("http://b.com/x.html"),
    ]
    store = build_store(
        spark, str(tmp_path_factory.mktemp("httpstore")), domains, links
    )
    srv = make_server(store, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", store
    srv.shutdown()
    srv.server_close()


def _get(base: str, path: str):
    try:
        with urllib.request.urlopen(base + path) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(base: str, path: str, body: dict):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_home_and_list(served):
    base, _ = served
    st, body = _get(base, "/")
    assert st == 200 and "table_versions" in body
    st, body = _get(base, "/list")
    assert st == 200
    assert [d["dom"] for d in body["domains"]] == ["a.com", "b.com", "c.com"]
    # keyset page 2 (ListDomainsController /list/{seed})
    st, body = _get(base, "/list/a.com")
    assert [d["dom"] for d in body["domains"]] == ["b.com", "c.com"]


def test_find_and_links(served):
    base, _ = served
    st, body = _get(base, "/find?domain=b.com")
    assert st == 200 and body["domain"]["dom"] == "b.com"
    st, _ = _get(base, "/find?domain=zzz.com")
    assert st == 404
    st, body = _get(base, "/links/a.com")
    assert st == 200
    # latest-only collapse: p1 once, newest crawl
    paths = [(l["subdom"], l["path"]) for l in body["links"]]
    assert paths == [("", "/p1.html"), ("", "/p2.html"), ("www", "/p3.html")]
    # keyset page via seed url (LinksController {seedURL})
    st, body = _get(base, "/links/a.com?seed=http%3A%2F%2Fa.com%2Fp1.html")
    assert [l["path"] for l in body["links"]] == ["/p2.html", "/p3.html"]
    # filterRegex (FilterLinksController target)
    st, body = _get(base, "/links/a.com?filterRegex=p2")
    assert [l["path"] for l in body["links"]] == ["/p2.html"]


def test_historical_and_find_links(served):
    base, _ = served
    st, body = _get(base, "/historical/http%3A%2F%2Fa.com%2Fp1.html")
    assert st == 200 and len(body["history"]) == 2
    assert body["history"][0]["time"] > body["history"][1]["time"]
    st, body = _get(base, "/findLinks?url=http%3A%2F%2Fa.com%2Fp1.html")
    assert st == 200 and body["link"]["stat"] == 200
    st, _ = _get(base, "/findLinks?url=http%3A%2F%2Fnope.com%2F")
    assert st == 404


def test_rest_add_and_errors(served):
    base, store = served
    st, body = _post(base, "/rest/add", {"links": [{"url": "http://new-http.com/x"}]})
    assert st == 200 and body["links_new"] == 1
    st, body = _post(base, "/rest/add", {"links": []})
    assert st == 400 and body["tag"] == "empty-links"
    st, body = _post(base, "/rest/add", {"links": [{"url": ""}]})
    assert st == 400 and body["tag"] == "bad-link-element"


def test_request_validation(served):
    """Malformed-but-parseable inputs get 400/404, never a 500
    (ADVICE r4: non-dict JSON bodies, non-integer limit, /rest/*)."""
    base, _ = served
    # non-dict JSON body parses fine but isn't an object
    req = urllib.request.Request(
        base + "/rest/add",
        data=b"[1]",
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            st, body = resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        st, body = e.code, json.loads(e.read())
    assert st == 400 and "object" in body["error"]
    # only /rest/add exists under /rest (reference rest.go)
    st, _ = _post(base, "/rest/somethingelse", {"links": [{"url": "http://x.com/"}]})
    assert st == 404
    # non-integer ?limit= is a 400, not an int() 500
    st, body = _get(base, "/list?limit=abc")
    assert st == 400 and "limit" in body["error"]


def test_exclude_toggle_and_priority(served):
    base, store = served
    st, body = _post(base, "/excludeToggle/c.com/ex", {})
    assert st == 200 and body["domain"]["excluded"] is True
    assert body["domain"]["exclude_reason"] == "Manual exclude"
    st, body = _post(base, "/excludeToggle/c.com/un", {})
    assert st == 200 and body["domain"]["excluded"] is False
    st, _ = _post(base, "/excludeToggle/c.com/sideways", {})
    assert st == 400

    st, body = _post(base, "/changePriority", {"domain": "c.com", "priority": 42})
    assert st == 200
    st, body = _get(base, "/find?domain=c.com")
    assert body["domain"]["priority"] == 42
    st, _ = _post(base, "/changePriority", {"domain": "c.com", "priority": 0})
    assert st == 400
    st, _ = _post(base, "/changePriority", {"domain": "c.com", "priority": 101})
    assert st == 400  # MaxAllowedDomainPriority (config.go:176)
    st, _ = _post(base, "/changePriority", {"domain": "zzz.com", "priority": 5})
    assert st == 404


def test_filter_links_redirect(served):
    base, _ = served
    req = urllib.request.Request(
        base + "/filterLinks",
        data=json.dumps({"domain": "a.com", "regex": "p[12]"}).encode(),
        method="POST",
    )

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(NoRedirect)
    try:
        opener.open(req)
        raise AssertionError("expected 303")
    except urllib.error.HTTPError as e:
        assert e.code == 303
        assert e.headers["Location"].startswith("/links/a.com?filterRegex=")
    st, _ = _post(base, "/filterLinks", {"domain": "a.com", "regex": "("})
    assert st == 400
    st, _ = _post(base, "/filterLinks", {"domain": "zzz.com", "regex": "x"})
    assert st == 404


def _get_html(base: str, path: str):
    req = urllib.request.Request(base + path, headers={"Accept": "text/html"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.headers.get("Content-Type", ""), resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read().decode()


def test_html_pages(served):
    base, _ = served
    # home: nav + table versions
    status, ctype, html = _get_html(base, "/")
    assert status == 200 and ctype.startswith("text/html")
    assert "Walker Console" in html and "Table versions" in html
    # styled UI: pages <link> the static stylesheet, and the asset
    # serves with the right type (reference console/public/css)
    assert '<link rel="stylesheet" href="/public/css/console.css">' in html
    status, ctype, css = _get_html(base, "/public/css/console.css")
    assert status == 200 and ctype.startswith("text/css")
    assert "border-collapse" in css
    # list: domains table, links anchors, exclude/priority forms, paging
    status, _, html = _get_html(base, "/list?limit=2")
    assert status == 200
    assert '<a href="/links/a.com">a.com</a>' in html
    assert 'action="/excludeToggle/a.com/ex"' in html
    assert 'action="/changePriority"' in html
    assert '/list/' in html  # next-page anchor (3 domains, limit 2)
    # links page: filter form + keyset next anchor via the rebuilt URL
    status, _, html = _get_html(base, "/links/a.com?limit=1")
    assert status == 200 and 'action="/filterLinks"' in html and "seed=" in html
    # find/findLinks/add/filterLinks render input forms on plain GET
    for path, marker in [
        ("/find", 'name="domain"'),
        ("/findLinks", 'name="url"'),
        ("/add", "<textarea"),
        ("/filterLinks", 'name="regex"'),
    ]:
        status, _, html = _get_html(base, path)
        assert status == 200 and marker in html, path
    # the JSON surface is untouched by negotiation
    status, payload = _get(base, "/list?limit=2")
    assert status == 200 and "domains" in payload


def test_html_form_post_add_and_redirect(served):
    base, store = served
    # classic form-encoded add (the /add page's textarea)
    data = urllib.parse.urlencode(
        {"links": "http://formadd.com/one.html\nhttp://formadd.com/two.html"}
    ).encode()
    req = urllib.request.Request(
        base + "/add",
        data=data,
        headers={
            "Content-Type": "application/x-www-form-urlencoded",
            "Accept": "text/html",
        },
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert "text/html" in resp.headers.get("Content-Type", "")
    status, payload = _get(base, "/links/formadd.com")
    assert status == 200 and len(payload["links"]) == 2
    # form-encoded filterLinks 303s to the links page like the JSON path
    data = urllib.parse.urlencode({"domain": "a.com", "regex": "p[0-9]"}).encode()
    req = urllib.request.Request(
        base + "/filterLinks",
        data=data,
        headers={
            "Content-Type": "application/x-www-form-urlencoded",
            "Accept": "text/html",
        },
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:  # urllib follows the 303
        assert resp.status == 200
        assert "Links for a.com" in resp.read().decode()
