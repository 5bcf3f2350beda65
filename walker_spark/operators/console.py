"""Console / CRUD surface: the reference's web-console data accessors
as plain DataFrame selects (reference: cassandra/datastore.go:538-1078,
console/ controllers; SURVEY §2.1/T5/W4).

Walker's console offers: list domains (paginated), find domain, list
links for a domain (paginated, optionally latest-crawl-only), find
link history, insert links, mark getnow, exclude/unexclude a domain.
Each maps to a partition-pruned scan or a small MERGE here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from walker_spark.config import WalkerConfig
from walker_spark.operators.dispatch import latest_links
from walker_spark.operators.seed import ingest_urls
from walker_spark.sources.store import FrontierStore


def list_domains(store: FrontierStore, seek_dom: str = "", limit: int = 50) -> DataFrame:
    """Keyset-paginated domain listing (ListDomains,
    datastore.go:593-656): domains after ``seek_dom``."""
    di = store.read("domain_info")
    if seek_dom:
        di = di.filter(F.col("dom") > seek_dom)
    return di.orderBy("dom").limit(limit)


def find_domain(store: FrontierStore, dom: str) -> DataFrame:
    return store.read("domain_info").filter(F.col("dom") == dom)


def list_links(
    store: FrontierStore,
    dom: str,
    seek: tuple[str, str, str] | None = None,
    limit: int = 50,
    latest_only: bool = True,
) -> DataFrame:
    """Links for one domain in clustering order with 3-layer keyset
    pagination over (subdom, path, proto) (ListLinks + the
    rememberTimes latest-only collapse, datastore.go:659-865,
    1008-1078 — T5/W4)."""
    links = store.read("links").filter(F.col("dom") == dom)
    if latest_only:
        links = latest_links(links)
    if seek is not None:
        s, p, pr = seek
        links = links.filter(
            (F.col("subdom") > s)
            | ((F.col("subdom") == s) & (F.col("path") > p))
            | ((F.col("subdom") == s) & (F.col("path") == p) & (F.col("proto") > pr))
        )
    return links.orderBy("subdom", "path", "proto", "time").limit(limit)


def link_history(store: FrontierStore, dom: str, subdom: str, path: str, proto: str) -> DataFrame:
    """All crawl-history rows for one URL, most recent first
    (ListLinkHistorical, datastore.go:868-922)."""
    return (
        store.read("links")
        .filter(
            (F.col("dom") == dom)
            & (F.col("subdom") == subdom)
            & (F.col("path") == path)
            & (F.col("proto") == proto)
        )
        .orderBy(F.col("time").desc(), F.col("write_seq").desc_nulls_last())
    )


def insert_links(store: FrontierStore, urls: list[str], cfg: WalkerConfig | None = None) -> dict:
    """Console 'add links' (InsertLinks, datastore.go:925-999) — same
    path as seeding."""
    cfg = cfg or WalkerConfig()
    df = store.spark.createDataFrame([(u,) for u in urls], "url string")
    return ingest_urls(store, df, cfg)


def mark_getnow(store: FrontierStore, dom: str, subdom: str, path: str, proto: str) -> None:
    """Queue a URL for ASAP crawl (UpdateURL getnow, ST4): appends a
    links row at time=epoch with getnow=true — the PK overwrite makes
    it the URL's authoritative uncrawled row."""
    from walker_spark.plans import schemas

    write_seq = store.version("links") + 1
    row = store.spark.createDataFrame(
        [(dom, subdom, path, proto)], "dom string, subdom string, path string, proto string"
    ).select(
        "dom",
        "subdom",
        "path",
        "proto",
        F.timestamp_millis(F.lit(0)).alias("time"),
        *[
            F.lit(True).alias("getnow") if f.name == "getnow"
            else F.lit(write_seq).cast("long").alias("write_seq") if f.name == "write_seq"
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schemas.LINKS.fields
            if f.name not in ("dom", "subdom", "path", "proto", "time")
        ],
    )
    store.append("links", row.select(*[f.name for f in schemas.LINKS.fields]))


def set_domain_excluded(
    store: FrontierStore, dom: str, excluded: bool, reason: str | None = None
) -> None:
    """Exclude/unexclude a domain from dispatching (UpdateDomain,
    datastore.go:562-590)."""
    di = store.read("domain_info")
    merged = di.select(
        *[
            F.when(F.col("dom") == dom, F.lit(excluded)).otherwise(F.col(c)).alias(c)
            if c == "excluded"
            else F.when(F.col("dom") == dom, F.lit(reason).cast("string"))
            .otherwise(F.col(c))
            .alias(c)
            if c == "exclude_reason"
            else F.col(c)
            for c in di.columns
        ]
    )
    store.overwrite("domain_info", merged)


def set_domain_priority(store: FrontierStore, dom: str, priority: int) -> bool:
    """Change a domain's dispatch priority (ChangePriorityController ->
    UpdateDomain with DomainInfoUpdateConfig{Priority:true},
    console/controllers.go:765-826). Returns False when the domain is
    not in domain_info (no write happens)."""
    di = store.read("domain_info")
    if di.filter(F.col("dom") == dom).isEmpty():
        return False
    merged = di.select(
        *[
            F.when(F.col("dom") == dom, F.lit(priority).cast("int"))
            .otherwise(F.col(c))
            .alias(c)
            if c == "priority"
            else F.col(c)
            for c in di.columns
        ]
    )
    store.overwrite("domain_info", merged)
    return True


def if_modified_since(time_col) -> "F.Column":
    """RFC1123 formatting of a last-crawl time for the If-Modified-Since
    header (X9; fetcher.go:731-735)."""
    return F.date_format(time_col, "EEE, dd MMM yyyy HH:mm:ss 'GMT'")


def read_link(
    store: FrontierStore,
    url: str,
    body_only: bool = False,
    meta_only: bool = False,
) -> str | None:
    """The reference's ``walker readlink`` report for one URL
    (cmd/cmd.go:163-267): parse+normalize the URL, find its latest
    links row, and render the link-info fields (or only the body /
    only the meta, matching --body-only/--meta-only). Returns None when
    the link is not in the datastore; the not-yet-crawled sentinel
    (time == epoch) renders the reference's 'present, but has not yet
    been fetched' line. Header multi-values are stored \\0-joined and
    printed one per line under a sorted key order, exactly like the
    reference's reproducible-printout sort."""
    from walker_spark.functions import urlkernel

    if body_only and meta_only:
        raise ValueError("can't specify both body_only and meta_only")
    norm = urlkernel.normalize_url(url)
    key = urlkernel.primary_key(norm) if norm is not None else None
    if key is None:
        raise ValueError(f"failed to parse link {url!r}")
    dom, subdom, path, proto = key
    rows = link_history(store, dom, subdom, path, proto).limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    if r["time"] is None or int(r["time"].timestamp()) == 0:
        return f"Link {url} is present, but has not yet been fetched\n"

    out: list[str] = []
    if not body_only:
        err = r["err"] or ""
        estring = "\n" + "".join(f"    {l}\n" for l in err.split("\n")) if err else "\n"
        full_url = urlkernel.url_from_key(dom, subdom, path, proto)
        out.append(f"Url:                {full_url}\n")
        out.append(f"HttpStatus:         {r['stat']}\n")
        out.append(f"CrawlTime:          {r['time'].isoformat(sep=' ')}\n")
        out.append(f"Error:              {estring}")
        out.append(f"RobotsExcluded:     {bool(r['robot_ex'])}\n")
        out.append(f"RedirectedTo:       {r['redto_url'] or ''}\n")
        out.append(f"GetNow:             {bool(r['getnow'])}\n")
        out.append(f"Mime:               {r['mime'] or ''}\n")
        out.append(f"FnvFingerprint:     {r['fnv']}\n")
        out.append(f"FnvTextFingerprint: {r['fnv_txt']}\n")
        headers = r["headers"]
        if not headers:
            out.append("HEADERS:        <none>\n")
        else:
            out.append("HEADERS:\n")
            for k in sorted(headers):
                for v in headers[k].split("\x00"):
                    out.append(f"    {k}: {v}\n")
    if not meta_only:
        body = r["body"]
        if not body_only:
            out.append(f"BODY:\n{body}\n" if body else "BODY:           <none>\n")
        else:
            out.append(f"{body or ''}\n")
    return "".join(out)
