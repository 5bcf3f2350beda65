"""robots.txt parser unit tests (REP semantics the engine relies on —
group selection, longest-match precedence, wildcards/anchors,
crawl-delay; reference behavior via temoto/robotstxt in
fetcher.go:656-721)."""

from __future__ import annotations

from walker_spark.functions import robots


def _grp(body: str, ua: str = "Walker"):
    return robots.group_for(body, ua)


def test_group_selection_longest_ua_prefix():
    body = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: walk\nDisallow: /walk\n\n"
        "User-agent: walker\nDisallow: /walker\nCrawl-delay: 9\n"
    )
    g = _grp(body, "Walker/1.0")
    assert not g.test("/walker/x")  # longest matching agent group wins
    assert g.test("/all") and g.test("/walk-not")  # other groups ignored
    assert g.crawl_delay == 9
    other = _grp(body, "SomethingElse")
    assert not other.test("/all/x") and other.test("/walker")


def test_longest_path_match_wins_and_allow_ties():
    body = (
        "User-agent: *\n"
        "Disallow: /shop\n"
        "Allow: /shop/public\n"
        "Disallow: /shop/public/secret\n"
    )
    g = _grp(body)
    assert g.test("/")
    assert not g.test("/shop/cart")
    assert g.test("/shop/public/item.html")  # longer Allow overrides
    assert not g.test("/shop/public/secret/x")  # longest rule wins again


def test_wildcards_and_anchors():
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/cache\n"
    )
    g = _grp(body)
    assert not g.test("/docs/file.pdf")
    assert g.test("/docs/file.pdf?x=1")  # $ anchors the end
    assert not g.test("/tmp123/cache")
    # '/tmp*/cache' is an unanchored prefix rule: '/tmp123/cached'
    # starts with a match, so it is disallowed per REP semantics
    assert not g.test("/tmp123/cached")
    assert g.test("/tmpx/other")


def test_empty_disallow_and_defaults():
    assert _grp("User-agent: *\nDisallow:\n").test("/anything")
    assert robots.group_for(None).test("/x")
    g = _grp("User-agent: *\nCrawl-delay: 2.5\n")
    assert g.crawl_delay == 2.5 and g.test("/x")


def test_comments_and_unknown_directives_ignored():
    body = (
        "# a comment\n"
        "User-agent: *  # trailing\n"
        "Sitemap: http://x.com/map.xml\n"
        "Disallow: /private # inline comment\n"
    )
    g = _grp(body)
    assert not g.test("/private/x")
    assert g.test("/public")


def test_json_roundtrip_preserves_rules():
    g = _grp("User-agent: *\nDisallow: /a\nAllow: /a/b\n")
    g2 = robots.RobotsGroup.from_json(g.to_json())
    for path in ("/a/x", "/a/b/c", "/z"):
        assert g.test(path) == g2.test(path)
