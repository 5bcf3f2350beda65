"""RSS 2.0 / Atom feed ingestion — URL discovery from the pages a
site *publishes*, completing the declared-URL source triad next to
sitemaps (what a site maps) and capture indexes (what an archive
holds).

The reference engine's frontier grows only from seed lists and parsed
outlinks (reference walker.go seeding + fetcher parse path); feeds
are how production crawlers catch NEW content fast — a feed is a
site-curated recency channel with publish timestamps, the natural
input to the recrawl scheduler (recrawl.py) as well as the frontier.

Scale shape mirrors sitemaps.py exactly: parsing is ONE projection
stack over the pages scan — per-document block extraction
(regexp_extract_all) + a single explode, then per-entry field
regexes; zero Python, no exchange until the caller aggregates, page
bodies never shuffle. All regex literals live in the Java-regex ∩ RE2
shared subset ((?s)/(?im) flags, non-greedy, no backreferences), and
every derived field is an exact integer or string so the DuckDB
oracle replays bit-for-bit.

Documented parse subset:
- RSS items take ``<link>`` ELEMENT TEXT; Atom entries take the first
  ``<link ... href="...">`` ATTRIBUTE (rel handling is not modeled —
  real-world Atom feeds put the alternate link first).
- RSS ``<pubDate>`` (RFC 822): day/month-name/year only — the month
  name maps through an English-abbreviation array (position = month
  number, identical array in the oracle), the rebuilt ISO string goes
  through try_cast(date) so calendar validation is the engine's
  (Feb 30 → absent). Atom ``<updated>`` takes the W3C date prefix,
  the sitemaps lastmod rule. Both emit exact epoch DAYS, -1 absent.
- Entry identity: RSS ``<guid>`` / Atom ``<id>``, falling back to the
  link — the dedup key a feed reader would use, surfaced so recrawl
  logic can spot re-dated entries.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemaps import _xml_unescape

if TYPE_CHECKING:  # pragma: no cover
    from ..config import WalkerConfig
    from ..sources.store import FrontierStore

_ITEM_BLOCK = r"(?s)<item>(.*?)</item>"
_ENTRY_BLOCK = r"(?s)<entry>(.*?)</entry>"
_RSS_LINK = r"(?s)<link>\s*(.*?)\s*</link>"
_ATOM_HREF = r"<link[^>]*href\s*=\s*\"([^\"]*)\""
_PUBDATE = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"
_UPDATED = r"(?s)<updated>\s*(.*?)\s*</updated>"
_RSS_GUID = r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>"
_ATOM_ID = r"(?s)<id>\s*(.*?)\s*</id>"
_RFC822 = r"(\d{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (\d{4})"
_DATE_PREFIX = r"^(\d{4}-\d{2}-\d{2})"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

#: month-name array: 1-based array_position == month number; the
#: DuckDB oracle uses list_position over the identical literal array.
MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)

#: HTML feed-discovery: <link> tags in page heads advertising
#: application/rss+xml or application/atom+xml alternates. HTML
#: attribute names are case-free, hence the (?i) href variant.
_LINK_TAG = r"(?i)<link[^>]*>"
_HREF_ATTR = r"(?i)href\s*=\s*\"([^\"]*)\""


def _rfc822_days(raw: Column) -> Column:
    """RFC 822 date → epoch days: extract (day, month-name, year),
    rebuild zero-padded ISO, try_cast(date) for calendar validation.
    NULL-safe at every step; the caller coalesces to -1."""
    day = F.regexp_extract(raw, _RFC822, 1)
    mon = F.regexp_extract(raw, _RFC822, 2)
    year = F.regexp_extract(raw, _RFC822, 3)
    mnum = F.array_position(
        F.array(*[F.lit(m) for m in MONTHS]), mon
    )
    iso = F.concat_ws(
        "-",
        year,
        F.lpad(mnum.cast("string"), 2, "0"),
        F.lpad(day, 2, "0"),
    )
    return F.datediff(
        iso.try_cast("date"), F.lit("1970-01-01").cast("date")
    )


def parse_feeds(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Parse feed documents into one row per entry: ``(feed_url,
    kind, link, same_host, pub_days, entry_id)``.

    - ``kind``: 'rss' (``<item>``) or 'atom' (``<entry>``);
    - ``link``: XML-entity-decoded, trimmed; entries without a link
      are dropped (nothing to crawl);
    - ``same_host``: audit column, sitemaps convention — feeds MAY
      declare cross-host links (unlike sitemaps), so this is signal,
      not a spec violation;
    - ``pub_days``: exact epoch days of pubDate (RFC 822 subset) or
      updated (W3C prefix); -1 absent/unparseable;
    - ``entry_id``: guid/id falling back to the link.
    """
    body = F.col(body_col).cast("string")
    host = lambda c: F.lower(F.regexp_extract(c, _HOST, 1))  # noqa: E731
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(body, F.lit(_ITEM_BLOCK), F.lit(1)),
            lambda b: F.struct(F.lit("rss").alias("kind"), b.alias("block")),
        ),
        F.transform(
            F.regexp_extract_all(body, F.lit(_ENTRY_BLOCK), F.lit(1)),
            lambda b: F.struct(F.lit("atom").alias("kind"), b.alias("block")),
        ),
    )
    rss = F.col("kind") == "rss"
    return (
        df.select(
            F.col(url_col).alias("feed_url"),
            F.explode(blocks).alias("_e"),
        )
        .select(
            "feed_url",
            F.col("_e.kind").alias("kind"),
            F.col("_e.block").alias("block"),
        )
        .select(
            "feed_url",
            "kind",
            F.trim(
                _xml_unescape(
                    F.when(
                        rss, F.regexp_extract("block", _RSS_LINK, 1)
                    ).otherwise(F.regexp_extract("block", _ATOM_HREF, 1))
                )
            ).alias("link"),
            F.when(
                rss,
                _rfc822_days(F.regexp_extract("block", _PUBDATE, 1)),
            )
            .otherwise(
                F.datediff(
                    F.regexp_extract(
                        F.regexp_extract("block", _UPDATED, 1),
                        _DATE_PREFIX,
                        1,
                    ).try_cast("date"),
                    F.lit("1970-01-01").cast("date"),
                )
            )
            .alias("_days"),
            F.trim(
                _xml_unescape(
                    F.when(
                        rss, F.regexp_extract("block", _RSS_GUID, 1)
                    ).otherwise(F.regexp_extract("block", _ATOM_ID, 1))
                )
            ).alias("_id"),
        )
        .filter(F.col("link") != "")
        .select(
            "feed_url",
            "kind",
            "link",
            (host(F.col("link")) == host(F.col("feed_url"))).alias(
                "same_host"
            ),
            F.coalesce(F.col("_days"), F.lit(-1)).cast("long").alias(
                "pub_days"
            ),
            F.when(F.col("_id") != "", F.col("_id"))
            .otherwise(F.col("link"))
            .alias("entry_id"),
        )
    )


def feeds_from_html(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Feed discovery from HTML ``<link rel=alternate
    type="application/rss+xml|atom+xml" href=...>`` head tags (the
    autodiscovery convention): one row ``(page_url, feed_url)`` per
    advertised feed. Attribute ORDER is free in HTML, so the tag list
    is filtered by type-attribute content and the href extracted
    separately — one zero-exchange array pipeline over the pages
    scan."""
    html = F.col(html_col).cast("string")
    tags = F.filter(
        F.regexp_extract_all(html, F.lit(_LINK_TAG), F.lit(0)),
        lambda t: F.lower(t).contains("application/rss+xml")
        | F.lower(t).contains("application/atom+xml"),
    )
    return (
        df.select(
            F.col(url_col).alias("page_url"),
            F.explode(tags).alias("_tag"),
        )
        .select(
            "page_url",
            F.trim(
                _xml_unescape(F.regexp_extract("_tag", _HREF_ATTR, 1))
            ).alias("feed_url"),
        )
        .filter(F.col("feed_url") != "")
    )


def seed_from_feeds(
    store: "FrontierStore",
    cfg: "WalkerConfig",
    feed_pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    enforce_same_host: bool = False,
) -> dict:
    """Seed the frontier with a feed snapshot's entry links through
    seed.ingest_urls — the same normalize → URL-seen → commit path as
    every other source (idempotent re-seed). Feeds may legitimately
    link cross-host, so same-host enforcement is OFF by default (the
    sitemaps spec rule does not apply); metrics carry the audit
    counts either way."""
    entries = parse_feeds(
        feed_pages, url_col=url_col, body_col=body_col
    ).localCheckpoint()
    n_entries = entries.count()
    kept = (
        entries.filter(F.col("same_host")) if enforce_same_host else entries
    )
    from . import seed

    metrics = seed.ingest_urls(
        store, kept.select(F.col("link").alias("url")), cfg
    )
    metrics["feed_entries"] = n_entries
    metrics["cross_host_dropped"] = (
        n_entries - kept.count() if enforce_same_host else 0
    )
    return metrics
