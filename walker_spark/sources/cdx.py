"""CDX-J source — the Common-Crawl / web-archive capture-index format.

A CDX-J line is ``<surt-key> <14-digit-timestamp> <json>`` (pywb /
Common Crawl cc-index releases): the JSON carries url, mime, status,
digest, WARC record offset/length/filename. At 10^10-URL scale the
capture index IS how a crawl bootstraps (seed from what an archive
already holds), dedups against history, and locates page bytes
without scanning WARCs — so this source feeds the same frontier path
as every other URL source.

Spark-first: ``spark.read.text`` is the line codec (transparent .gz),
and the parse is ONE zero-exchange projection — the line splits by an
anchored regex, the JSON decodes with ``from_json`` under an explicit
schema (never inference — the jsonl.py rule), the 14-digit timestamp
becomes exact epoch seconds through SESSION-TIMEZONE-PROOF arithmetic
(the date round-trips try_to_timestamp→to_date so the tz cancels; the
clock is pure integer math with range checks) and garbage becomes an
audited error instead of an ANSI throw. Malformed lines follow the
jsonl/warc
contract: ``audit`` (default) keeps them with a typed ``_error``
column; ``strict`` raises AT SCAN TIME via a ``raise_error`` branch —
no extra validation job, the error surfaces in the consuming action.

SURT keys (Sort-friendly URI Reordering Transform) are recomputed
from the URL by ``surt_key`` — a DOCUMENTED SUBSET of the canonical
transform (lowercase everything, drop userinfo and default ports,
reverse host labels with commas, non-default port kept after the
host, '?query' kept verbatim; no www-strip or param reordering —
those belong to the URL-normalization kernel,
functions/urlkernel.py) — so an index whose stored key disagrees with
its url is detectable (``surt_matches``).

Reference parity: walker seeds and dedups its frontier from URL
tables (seeder.go / datastore.go); a capture index is the archive-
scale equivalent of that URL inventory, and seed_from_cdx feeds the
identical normalize → URL-seen → commit path (seed.ingest_urls).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from ..config import WalkerConfig
    from .store import FrontierStore

#: anchored line shape: key SP 14-digit ts SP {json}
_LINE = r"^(\S+) (\d{14}) (\{.*\})\s*$"

#: explicit CDX-J payload schema — numeric fields arrive as STRINGS in
#: the wild (pywb writes them quoted); typed columns are derived.
CDXJ_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)

# URL pieces for surt_key — Java-regex ∩ RE2 subset, shared verbatim
# with the DuckDB oracle
_AUTHORITY = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
_PATH = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"^[^?#]*\?([^#]*)"


def surt_key(url: Column | str) -> Column:
    """SURT form of a URL (documented subset, see module docstring):
    ``com,example)/path?q`` — host labels reversed with commas,
    lowercase, userinfo dropped, default :80/:443 dropped, any other
    port kept after the reversed host (``com,example:8080)``), empty
    path → '/'. Pure column expression (zero Python); returns NULL
    for strings with no authority."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    auth = F.regexp_extract(u, _AUTHORITY, 1)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.regexp_replace(auth, r":\d*$", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keep_port = ~port.isin("", "80", "443")
    path = F.regexp_extract(u, _PATH, 1)
    query = F.regexp_extract(u, _QUERY, 1)
    return F.when(
        auth != "",
        F.concat(
            rev,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            F.lit(")"),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
                F.lit("")
            ),
        ),
    )


def _epoch_seconds(ts: Column) -> Column:
    """Exact epoch seconds (BIGINT) of a 14-digit ``yyyyMMddHHmmss``
    UTC string, SESSION-TIMEZONE-PROOF: the date parses through
    try_to_timestamp and immediately collapses back to a DATE (the
    session-tz offset round-trips out), then datediff × 86400 plus a
    pure-integer clock with explicit range checks. NULL on any
    invalid component (month 13, hour 24, short string, '')."""
    d = F.to_date(F.try_to_timestamp(F.substring(ts, 1, 8), F.lit("yyyyMMdd")))
    hh = F.substring(ts, 9, 2).try_cast("long")
    mm = F.substring(ts, 11, 2).try_cast("long")
    ss = F.substring(ts, 13, 2).try_cast("long")
    days = F.datediff(d, F.to_date(F.lit("1970-01-01"))).cast("long")
    return F.when(
        d.isNotNull() & (hh < 24) & (mm < 60) & (ss < 60),
        days * 86400 + hh * 3600 + mm * 60 + ss,
    )


def parse_cdx_lines(
    lines: DataFrame, line_col: str = "value", strict: bool = False
) -> DataFrame:
    """Parse CDX-J lines into typed capture rows: ``(surt, ts_s, url,
    mime, status, digest, length_b, offset_b, filename, surt_matches,
    _error)``.

    - ``ts_s``: the 14-digit UTC timestamp as exact epoch SECONDS
      (BIGINT; -1 on a good line is impossible — a bad timestamp is an
      ``_error='ts'`` row with NULL fields).
    - ``status/length_b/offset_b``: typed BIGINT via try_cast (absent
      or non-numeric → NULL, not a row error — archives omit them).
    - ``surt_matches``: stored key == surt_key(url) under the subset
      transform; an audit signal, not a filter.
    - ``_error``: '' | 'format' (line shape) | 'json' (invalid JSON or
      missing url) | 'ts' (unparseable timestamp). ``strict=True``
      raises at scan time on the first malformed line instead
      (raise_error branch — no separate validation job).

    Zero-exchange single projection stack; line text never shuffles.
    """
    line = F.col(line_col)
    parts = [F.regexp_extract(line, _LINE, i) for i in (1, 2, 3)]
    parsed = lines.select(
        line.alias("_line"),
        parts[0].alias("_surt"),
        parts[1].alias("_ts"),
        parts[2].alias("_json"),
    ).select(
        "_line",
        "_surt",
        "_ts",
        F.from_json("_json", CDXJ_JSON_SCHEMA).alias("_j"),
        _epoch_seconds(F.col("_ts")).alias("_ts_s"),
    )
    err = (
        F.when(F.col("_surt") == "", F.lit("format"))
        .when(F.col("_j").isNull() | F.col("_j.url").isNull(), F.lit("json"))
        .when(F.col("_ts_s").isNull(), F.lit("ts"))
        .otherwise(F.lit(""))
    )
    parsed = parsed.withColumn("_error", err)
    if strict:
        parsed = parsed.withColumn(
            "_error",
            F.when(
                F.col("_error") != "",
                F.raise_error(
                    F.concat(
                        F.lit("malformed CDX-J line ("),
                        F.col("_error"),
                        F.lit("): "),
                        F.substring("_line", 1, 120),
                    )
                ),
            ).otherwise(F.col("_error")),
        )
    good = F.col("_error") == ""
    nul = F.lit(None)
    return parsed.select(
        F.when(good, F.col("_surt")).otherwise(nul).alias("surt"),
        F.when(good, F.col("_ts_s")).otherwise(nul).alias("ts_s"),
        F.when(good, F.col("_j.url")).otherwise(nul).alias("url"),
        F.when(good, F.col("_j.mime")).otherwise(nul).alias("mime"),
        F.when(good, F.col("_j.status").try_cast("long"))
        .otherwise(nul)
        .alias("status"),
        F.when(good, F.col("_j.digest")).otherwise(nul).alias("digest"),
        F.when(good, F.col("_j.length").try_cast("long"))
        .otherwise(nul)
        .alias("length_b"),
        F.when(good, F.col("_j.offset").try_cast("long"))
        .otherwise(nul)
        .alias("offset_b"),
        F.when(good, F.col("_j.filename")).otherwise(nul).alias("filename"),
        F.when(good, F.col("_surt") == surt_key(F.col("_j.url")))
        .otherwise(nul)
        .alias("surt_matches"),
        "_error",
    )


def read_cdxj(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """Read CDX-J files (plain or .gz — spark.read.text handles both)
    into parsed capture rows. See parse_cdx_lines for the contract."""
    return parse_cdx_lines(spark.read.text(path), strict=strict)


def latest_captures(parsed: DataFrame, key: str = "url") -> DataFrame:
    """Collapse a capture index to the LATEST capture per ``key``:
    one aggregation — ``max(struct(ts_s, digest, offset_b, ...))``
    picks the newest row with a total deterministic tiebreak (struct
    comparison is field-order lexicographic), so a mega-URL with
    millions of captures is a hot REDUCE key with map-side partials,
    never a hot window partition (the anchor_text_agg lesson). Error
    rows (NULL key) are dropped."""
    cols = [c for c in parsed.columns if c not in (key, "_error")]
    return (
        parsed.filter(F.col("_error") == "")
        .groupBy(key)
        .agg(F.max(F.struct("ts_s", "digest", *[c for c in cols if c not in ("ts_s", "digest")])).alias("_m"))
        .select(key, *[F.col(f"_m.{c}").alias(c) for c in ["ts_s", "digest"] + [c for c in cols if c not in ("ts_s", "digest")]])
        .select(key, *cols)
    )


def seed_from_cdx(
    store: "FrontierStore",
    cfg: "WalkerConfig",
    parsed: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefix: str = "text/html",
) -> dict:
    """Seed the frontier from a capture index: keep good rows with the
    wanted status codes and MIME prefix, collapse to one row per URL
    (the index may hold thousands of captures per URL — the frontier
    wants the URL once), then hand off to seed.ingest_urls — the same
    normalize → URL-seen → commit path as every other source, so
    re-seeding the same index is idempotent. Returns ingest metrics
    plus capture counts (one checkpointed distinct, no double scan)."""
    urls = (
        parsed.filter(
            (F.col("_error") == "")
            & F.col("status").isin(list(statuses))
            & F.col("mime").startswith(mime_prefix)
        )
        .select("url")
        .dropDuplicates(["url"])
        .localCheckpoint()
    )
    from ..operators import seed

    metrics = seed.ingest_urls(store, urls, cfg)
    metrics["capture_urls"] = urls.count()
    return metrics
