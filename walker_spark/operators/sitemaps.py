"""Sitemap ingestion (sitemaps.org protocol) — frontier seeding from
the URLs a site *declares*, next to the ones the crawl *discovers*.

The reference engine has no sitemap support (its frontier grows only
from seed lists and parsed outlinks — reference walker.go seeding +
fetcher parse path); every production crawler ships it, because
sitemaps are how large sites expose deep/unlinked pages and recrawl
hints (lastmod/changefreq/priority). This module adds the three
surfaces: parse sitemap XML (urlset + sitemapindex) into typed entry
rows, discover sitemap URLs from robots.txt ``Sitemap:`` directives
(the standard discovery channel), and pipe declared URLs through the
EXISTING seed path (seed.ingest_urls) so normalization, URL-seen
dedup, and new-domain registration are the same code the crawl uses.

Scale shape: parsing is ONE projection stack over the pages scan —
per-page block extraction (regexp_extract_all) and a single explode
(fan-out one row per declared URL, exactly like the outlink explode),
then per-entry field regexes; no exchange until the caller aggregates,
no Python anywhere, and page bodies never shuffle (the explode output
carries only the entry block, bounded by the sitemap spec's 50k-URL /
50 MB file caps). All derived fields are exact integers (epoch days,
priority in milli-units via DECIMAL) so the DuckDB oracle replays them
bit-for-bit. Regex literals stay inside the Java-regex ∩ RE2 shared
subset (the text_normalize rule): ``(?s)``/``(?im)`` flags, non-greedy
``.*?``, no backreferences (RE2 has none — hence two block passes, one
per tag, instead of ``<(url|sitemap)>...</\\1>``); patterns are passed
through column functions, never SQL string literals, so no escaping
layer sits between the Python source and the regex engine.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from ..config import WalkerConfig
    from ..sources.store import FrontierStore

# per-tag block regexes (RE2-safe: no backreference to unify them)
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"
_DATE_PREFIX = r"^(\d{4}-\d{2}-\d{2})"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_ROBOTS_SITEMAP = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"

# the five XML predefined entities, &amp; LAST so it never
# re-introduces a decodable sequence — identical chain on both engines
XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _xml_unescape(col: Column) -> Column:
    for ent, ch in XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _blocks(body: Column, pattern: str, kind: str) -> Column:
    return F.transform(
        F.regexp_extract_all(body, F.lit(pattern), F.lit(1)),
        lambda b: F.struct(
            F.lit(kind).alias("kind"), b.alias("block")
        ),
    )


def parse_sitemaps(
    df: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    max_loc_len: int = 2048,
) -> DataFrame:
    """Parse sitemap documents into one row per declared entry:
    ``(sitemap_url, kind, loc, same_host, lastmod_days, changefreq,
    priority_milli)``.

    - ``kind``: ``'url'`` (a page, from ``<urlset>``) or ``'sitemap'``
      (a child sitemap, from ``<sitemapindex>``) — index files recurse
      through the caller's fetch loop, exactly like redirect hops.
    - ``loc``: XML-entity-decoded, whitespace-trimmed; entries with a
      missing/empty ``<loc>`` or one longer than ``max_loc_len`` (the
      spec's 2048-char cap) are dropped.
    - ``same_host``: spec §"Sitemap file location" — a sitemap may only
      declare URLs on its own host; emitted as a column (not enforced)
      so callers can audit cross-host declarations instead of silently
      losing them.
    - ``lastmod_days``: W3C-datetime date part as exact epoch DAYS
      (BIGINT; -1 = absent/unparseable — no floats, no timezone
      parsing, so both engines agree bit-for-bit).
    - ``priority_milli``: priority × 1000 through DECIMAL(4,3) (exact;
      spec default 0.5 → 500 when absent); ``changefreq`` lowercased,
      '' when absent.
    """
    body = F.col(body_col).cast("string")
    host = lambda c: F.lower(F.regexp_extract(c, _HOST, 1))  # noqa: E731
    return (
        df.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(
                F.concat(
                    _blocks(body, _URL_BLOCK, "url"),
                    _blocks(body, _SITEMAP_BLOCK, "sitemap"),
                )
            ).alias("_e"),
        )
        .select(
            "sitemap_url",
            F.col("_e.kind").alias("kind"),
            F.col("_e.block").alias("block"),
        )
        .select(
            "sitemap_url",
            "kind",
            F.trim(
                _xml_unescape(F.regexp_extract("block", _LOC, 1))
            ).alias("loc"),
            F.regexp_extract("block", _LASTMOD, 1).alias("_lastmod"),
            F.lower(F.regexp_extract("block", _CHANGEFREQ, 1)).alias(
                "changefreq"
            ),
            F.regexp_extract("block", _PRIORITY, 1).alias("_prio"),
        )
        .filter((F.col("loc") != "") & (F.length("loc") <= max_loc_len))
        .select(
            "sitemap_url",
            "kind",
            "loc",
            (host(F.col("loc")) == host(F.col("sitemap_url"))).alias(
                "same_host"
            ),
            F.coalesce(
                F.datediff(
                    F.regexp_extract(
                        "_lastmod", _DATE_PREFIX, 1
                    ).try_cast("date"),
                    F.lit("1970-01-01").cast("date"),
                ),
                F.lit(-1),
            )
            .cast("long")
            .alias("lastmod_days"),
            "changefreq",
            F.coalesce(
                (F.col("_prio").try_cast("decimal(4,3)") * 1000).cast(
                    "long"
                ),
                F.lit(500),
            ).alias("priority_milli"),
        )
    )


def sitemaps_from_robots(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Sitemap discovery from robots.txt ``Sitemap:`` directives (the
    robots-exclusion standard's only cross-host-allowed line): one row
    ``(robots_url, sitemap_url)`` per directive. A zero-exchange
    projection + explode over the (tiny) robots snapshot — the same
    robots_pages table fetch.py's rules build reads, so discovery adds
    no pages scan."""
    body = F.col(body_col).cast("string")
    return df.select(
        F.col(url_col).alias("robots_url"),
        F.explode(
            F.regexp_extract_all(body, F.lit(_ROBOTS_SITEMAP), F.lit(1))
        ).alias("sitemap_url"),
    ).filter(F.col("sitemap_url") != "")


def seed_from_sitemaps(
    store: "FrontierStore",
    cfg: "WalkerConfig",
    sitemap_pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    enforce_same_host: bool = True,
) -> dict:
    """Seed the frontier with a sitemap snapshot's declared page URLs:
    parse, keep ``kind='url'`` entries (index recursion is the fetch
    loop's job), optionally enforce the spec's same-host rule, then
    hand off to seed.ingest_urls — the SAME normalize → URL-seen dedup
    → links/domain_info commit path every other URL source uses, so
    re-seeding an unchanged sitemap is a no-op (idempotent) and
    sitemap URLs get the identical canonical keys as crawled links.
    Returns ingest metrics plus the declared/cross-host entry counts
    (counted on one checkpointed parse — no double parse)."""
    entries = parse_sitemaps(
        sitemap_pages, url_col=url_col, body_col=body_col
    )
    pages = entries.filter(F.col("kind") == "url").localCheckpoint()
    n_declared = pages.count()
    kept = (
        pages.filter(F.col("same_host")) if enforce_same_host else pages
    )
    from . import seed

    metrics = seed.ingest_urls(
        store, kept.select(F.col("loc").alias("url")), cfg
    )
    metrics["sitemap_entries"] = n_declared
    metrics["cross_host_dropped"] = (
        n_declared - kept.count() if enforce_same_host else 0
    )
    return metrics
