"""Deterministic synthetic web generator (Common-Crawl-style `pages`).

Builds the driver-mandated input table (url, warc_ts, html, text, lang)
— BASELINE.json ``input_hint`` — fully distributed: the driver only
decides (domain_idx, page_idx) ranges; HTML is materialized inside
``mapInPandas`` from a pure hash of (seed, domain, page), so the same
parameters always produce byte-identical pages at any parallelism.

The corpus exercises every fetch/parse/dispatch operator (FIXTURES.md):

* interlinked pages: a/area/iframe/object/embed links, relative +
  absolute hrefs, cross-domain links (frontier growth);
* robots.txt per host: allow-all / disallow-prefix / crawl-delay
  families (incl. one above max_crawl_delay);
* meta noindex / nofollow pages;
* duplicate-content families: the same body text served at
  ``/dup{i}.html``, ``?pag=1``, ``?ref=abc`` so fnv_txt clusters and
  query-param filtering trigger;
* SID-bearing outlinks (``;jsessionid=...`` / ``?phpsessid=...``);
* script/style blocks (text-extraction parity);
* redirect pages (immediate meta refresh = the WARC-style stand-in for
  a 301; the fetch stage emits hop rows with ``redto_url``);
* one mega-host with ``mega_factor`` × the normal page count (skew
  fixture O12);
* non-HTML resources (images) and oversized pages (content cap).

``text`` is derived by running the generated HTML through the engine's
own parity-tested parser, so it matches the reference's extraction
rules byte-for-byte (parse.go:62-76 via the golden-tested kernel).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from walker_spark.functions import htmlparse
from walker_spark.plans import schemas

_WORDS = (
    "web crawl spark frontier parquet domain robots politeness segment "
    "dispatch fetch parse link text token shard bucket bloom filter "
    "arrow vector batch plan shuffle executor partition skew salt"
).split()

BASE_TS_MS = 1_690_000_000_000  # fixed warc_ts base (before test NOW)


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts (seeded content decisions)."""
    s = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def domain_name(di: int) -> str:
    return f"site{di:05d}.example.com" if di % 7 == 3 else f"site{di:05d}.com"


def page_url(di: int, pi: int) -> str:
    host = domain_name(di)
    if pi == 0:
        return f"http://{host}/"
    return f"http://{host}/p{pi}.html"


def _page_html(
    seed: int, di: int, pi: int, n_domains: int, pages_per_domain: int,
    words_per_page: int = 6,
) -> str:
    h = _h(seed, di, pi)
    host = domain_name(di)
    # body text: words_per_page pseudo-random words in ~60-word paragraphs
    words = []
    w = h
    for i in range(words_per_page):
        if i % 16 == 0:
            w = _h(seed, di, pi, i)  # refresh entropy every 16 words
        words.append(_WORDS[(w >> ((i % 16) * 4)) % len(_WORDS)])
    paras = [
        " ".join(words[p : p + 60]) for p in range(0, len(words), 60)
    ]
    para = "</p><p>".join(paras)

    links = []
    # same-domain chain + fanout (keeps the frontier growing)
    for nxt in ((pi + 1) % pages_per_domain, (pi * 2 + 1) % pages_per_domain):
        if nxt != pi:
            links.append(f'<a href="/p{nxt}.html">next {nxt}</a>')
    # relative link
    links.append(f'<a href="p{(pi + 3) % pages_per_domain}.html">rel</a>')
    # cross-domain link
    other = (di + 1 + (h % max(1, n_domains - 1))) % n_domains
    links.append(f'<a href="{page_url(other, h % pages_per_domain)}">x</a>')
    # robots-excluded target on every root page (families 2/4 disallow it)
    if pi == 0:
        links.append('<a href="/private/area.html">private</a>')

    extras = []
    fam = h % 10
    if fam == 0:  # SID-bearing outlinks (url_test.go:22-57 families)
        links.append(f'<a href="/p{pi}.html;jsessionid=123{pi}A">sid</a>')
        links.append(f'<a href="/p{pi}.html?phpsessid=ab{pi}&x=1">sidq</a>')
    elif fam == 1:  # iframe/object/embed links (parse.go:135-215)
        links.append(f'<iframe src="/frame{pi}.html"></iframe>')
        links.append(f'<object data="/obj{pi}.html"></object>')
        links.append(f'<embed src="/emb{pi}.html">')
    elif fam == 2:  # meta nofollow page
        extras.append('<meta name="robots" content="nofollow">')
    elif fam == 3:  # meta noindex page
        extras.append('<meta name="robots" content="noindex">')
    elif fam == 4:  # script/style content that must not leak into text
        extras.append(f"<script>var x = {pi};</script><style>p {{color: red}}</style>")
    elif fam == 5:  # duplicate-content family: same text under params
        links.append(f'<a href="/dup{pi % 7}.html">dup</a>')
        links.append(f'<a href="/dup{pi % 7}.html?pag=1">dup page</a>')
        links.append(f'<a href="/dup{pi % 7}.html?ref=abc">dup ref</a>')
    elif fam == 6:  # meta refresh link (parse.go:239-251)
        extras.append(f'<meta http-equiv="refresh" content="5; url=/p{(pi + 9) % pages_per_domain}.html">')
    elif fam == 7 and pi != 0:  # HTTP-redirect stand-in: immediate refresh
        # (fetcher.go:723-749 CheckRedirect; hop rows datastore.go:416-436).
        # Root pages stay real so every seed fetch yields content.
        target = (pi * 3 + 5) % pages_per_domain
        return (
            '<html><head><meta http-equiv="refresh" content="0; '
            f'url=/p{target}.html"></head><body></body></html>'
        )

    title = f"Page {pi} of {host}"
    return (
        "<html><head><title>%s</title>%s</head><body>"
        "<h1>%s</h1><p>%s</p>%s</body></html>"
        % (title, "".join(extras), title, para, " ".join(links))
    )


def _dup_html(seed: int, di: int, slot: int) -> str:
    """Duplicate-content target: identical body text regardless of the
    query string it is fetched with (drives J5/A5 param filtering)."""
    words = [_WORDS[(_h(seed, di, "dup", slot) >> (i * 5)) % len(_WORDS)] for i in range(4)]
    return "<html><body><p>%s</p></body></html>" % " ".join(words)


def _robots_txt(di: int) -> str | None:
    """Robots family per domain (fetcher.go:656-721 behaviors)."""
    fam = di % 5
    if fam == 0:
        return None  # no robots.txt -> default group
    if fam == 1:
        return "User-agent: *\nDisallow:\n"  # allow all
    if fam == 2:
        return "User-agent: *\nDisallow: /private/\nDisallow: /obj\n"
    if fam == 3:
        return "User-agent: *\nCrawl-delay: 2\n"
    return "User-agent: *\nDisallow: /emb\nCrawl-delay: 700\n"  # above 5m cap


def generate_pages(
    spark: SparkSession,
    n_domains: int = 20,
    pages_per_domain: int = 30,
    seed: int = 42,
    mega_domain: int | None = 0,
    mega_factor: int = 10,
    parallelism: int | None = None,
    words_per_page: int = 6,
) -> DataFrame:
    """The synthetic web as a DataFrame in the ``pages`` schema.
    ``mega_domain`` (if set) gets ``mega_factor``× the pages — the skew
    fixture. Page count: n_domains*pages_per_domain (+ mega extra)."""
    specs = []
    for di in range(n_domains):
        n_pages = pages_per_domain * (mega_factor if di == mega_domain else 1)
        specs.append((di, n_pages))
    spec_df = spark.createDataFrame(specs, "di int, n_pages int")
    if parallelism:
        spec_df = spec_df.repartition(parallelism, "di")

    pages_pd = pages_per_domain
    n_doms = n_domains
    wpp = words_per_page

    def gen(iterator):
        for pdf in iterator:
            rows = {"url": [], "warc_ts_ms": [], "html": [], "text": [], "lang": []}

            def emit(url, html_s, ts_off):
                raw = html_s.encode("utf-8")
                rows["url"].append(url)
                rows["warc_ts_ms"].append(BASE_TS_MS + ts_off)
                rows["html"].append(raw)
                rows["text"].append(htmlparse.parse_html(raw).text)
                rows["lang"].append("en")

            for di, n_pages in zip(pdf["di"], pdf["n_pages"]):
                di = int(di)
                host = domain_name(di)
                robots = _robots_txt(di)
                if robots is not None:
                    raw = robots.encode()
                    rows["url"].append(f"http://{host}/robots.txt")
                    rows["warc_ts_ms"].append(BASE_TS_MS)
                    rows["html"].append(raw)
                    rows["text"].append(None)
                    rows["lang"].append(None)
                for pi in range(int(n_pages)):
                    emit(
                        page_url(di, pi),
                        _page_html(seed, di, pi, n_doms, pages_pd, wpp),
                        (di * 9973 + pi) % 86_400_000,
                    )
                # duplicate-content targets (same text, 3 query forms)
                for slot in range(3):
                    html_s = _dup_html(seed, di, slot)
                    for q in ("", "?pag=1", "?ref=abc"):
                        emit(
                            f"http://{host}/dup{slot}.html{q}",
                            html_s,
                            (di * 9973 + 777 + slot) % 86_400_000,
                        )
                # a non-HTML resource and an image
                rows["url"].append(f"http://{host}/logo.png")
                rows["warc_ts_ms"].append(BASE_TS_MS)
                rows["html"].append(b"\x89PNG fake image bytes " + str(di).encode())
                rows["text"].append(None)
                rows["lang"].append(None)
            yield pd.DataFrame(rows)

    raw = spec_df.mapInPandas(
        gen, "url string, warc_ts_ms long, html binary, text string, lang string"
    )
    return raw.select(
        "url",
        F.timestamp_millis("warc_ts_ms").alias("warc_ts"),
        "html",
        "text",
        "lang",
    ).select(*[f.name for f in schemas.PAGES.fields])


def seed_urls(n_domains: int, every: int = 1) -> list[str]:
    """Deterministic seed list: the root page of every ``every``-th
    domain (the shared seed list for parity runs, FIXTURES.md §5)."""
    return [page_url(di, 0) for di in range(0, n_domains, every)]
