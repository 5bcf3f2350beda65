"""HTML parse kernel goldens.

Text extraction goldens from the reference's own fixtures
(fetcher_test.go:1255-1344); link/meta behavior from parse.go rules.
"""

from walker_spark.functions.htmlparse import (
    decode_html,
    parse_html,
    parse_html_str,
    parser_cfg,
    sniff_charset,
)

HTML_NO_LINKS = """<!DOCTYPE html>
<html>
<head>
<meta http-equiv="Content-Type" content="text/html; charset=utf-8">
<title>No Links</title>
</head>
<div>
\tRoses are red, violets are blue, golang is the bomb, aint it so true!
</div>
</html>"""

TEXT_NO_LINKS = (
    "No Links\n\nRoses are red, violets are blue, golang is the bomb, aint it so true!"
)

HTML_SCRIPT_STYLE = """<!DOCTYPE html><html><head>
<meta http-equiv="Content-Type" content="text/html; charset=utf-8">
<title>Bit of content</title></head>
<div>Real text here</div>
<script type="text/javascript">this = stuff.shouldBeIgnored()</script>
This is okay
<style>
h1 {so: should-this;}
\t<div>Even in a sub-tag</div>
</style>
</html>"""

TEXT_SCRIPT_STYLE = "Bit of content\n\nReal text here\n\nThis is okay"


def test_text_golden_no_links():
    assert parse_html(HTML_NO_LINKS.encode()).text == TEXT_NO_LINKS


def test_text_golden_script_style_excluded():
    # fetcher_test.go:1314-1344
    assert parse_html(HTML_SCRIPT_STYLE.encode()).text == TEXT_SCRIPT_STYLE


def test_anchor_links_normalized():
    html = b"""<html><body>
    <a href="/page2.html">two</a>
    <a href="HTTP://B.com/x#frag">abs</a>
    <a href=" http://c.com/spaced ">spaced</a>
    <div href="/nope.html">not a link tag</div>
    </body></html>"""
    r = parse_html(html)
    assert r.links == ["/page2.html", "http://b.com/x", "http://c.com/spaced"]


def test_object_embed_iframe_links():
    # fetcher_test.go:1070 family; parse.go:96-110, 171-215, 262-295
    html = b"""<html><body>
    <object data="/obj.swf" type="app/x"></object>
    <embed src="/emb.mov">
    <iframe src="/frame.html"></iframe>
    <iframe srcdoc="<a href='/inner.html'>i</a>"></iframe>
    </body></html>"""
    r = parse_html(html)
    assert r.links == ["/obj.swf", "/emb.mov", "/frame.html", "/inner.html"]


def test_ignore_tags_config():
    html = b'<a href="/a.html">x</a><embed src="/e.mov">'
    r = parse_html(html, parser_cfg(ignore_tags=("a", "embed")))
    assert r.links == []


def test_meta_robots_flags():
    html = b"""<html><head>
    <meta name="ROBOTS" content="NoIndex, NoFollow">
    </head><body><a href="/after.html">x</a></body></html>"""
    r = parse_html(html)
    assert r.meta_noindex and r.meta_nofollow
    # links after a nofollow meta are not collected (parse.go:92-93)
    assert r.links == []


def test_meta_nofollow_only_stops_subsequent():
    html = b"""<html><body>
    <a href="/before.html">x</a>
    <meta name="robots" content="nofollow">
    <a href="/after.html">y</a>
    </body></html>"""
    r = parse_html(html)
    assert r.links == ["/before.html"]
    assert r.meta_nofollow and not r.meta_noindex


def test_meta_refresh_link():
    # regex `^\s*\d+;\s*url=(.*)` over the *lowercased* content
    # (parse.go:167, 239-251)
    html = b'<meta http-equiv="refresh" content="3; url=HTTP://A.com/NEXT.html">'
    r = parse_html(html)
    assert r.links == ["http://a.com/next.html"]


def test_nested_script_parent_tracking():
    html = b"<script>var a;<script>nested</script>ignored too</script>visible"
    r = parse_html(html)
    # html tokenizers treat </script> as the end of raw text; the
    # remainder re-enters text mode
    assert "var a" not in r.text
    assert "visible" in r.text


def test_charset_sniffing():
    assert sniff_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert sniff_charset(b'<meta charset="utf-8"><p>x</p>') == "utf-8"
    assert (
        sniff_charset(b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">')
        == "cp1252"
    )
    assert sniff_charset(b"plain") == "cp1252"
    # cp1252 high bytes decode without error
    assert decode_html(b"caf\xe9") == "caf\xe9".encode("latin-1").decode("cp1252")


def test_utf8_meta_page_with_accents():
    html = '<meta charset="utf-8"><p>café</p>'.encode("utf-8")
    assert parse_html(html).text == "café"


def test_srcdoc_nofollow_honored():
    html = b"""<iframe srcdoc="<meta name='robots' content='nofollow'><a href='/x.html'>x</a>"></iframe>"""
    # honor_meta_nofollow=False (default): inner links still merged
    assert parse_html(html).links == []  # inner nofollow precedes inner link
    html2 = b"""<iframe srcdoc="<a href='/x.html'>x</a><meta name='robots' content='nofollow'>"></iframe>"""
    assert parse_html(html2).links == ["/x.html"]
    # honor_meta_nofollow=True: inner nofollow suppresses the merge
    assert parse_html(html2, parser_cfg(honor_meta_nofollow=True)).links == []
