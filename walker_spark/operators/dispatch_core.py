"""Per-domain segment selection — the pure core of the dispatcher.

Runs inside ``applyInPandas`` groups (one group per domain, bounded by
the rank caps applied Spark-side in :mod:`walker_spark.operators.dispatch`).
Reimplements the observable semantics of the reference's
SegmentGenerator (reference: cassandra/dispatcher.go:492-1015):

* classification into getnow / uncrawled / crawled-eligible lists, each
  in clustering order ``(subdom, path, proto)`` (dispatcher.go:535-624);
* duplicate-content query-parameter filtering via fingerprint clusters
  (dispatcher.go:732-863) — clusters keyed by
  ``(fnv_txt, subdom + decoded-path-sans-query)``, baseline = first
  link in push order, a parameter is removable when any cluster member
  disagrees with the baseline's value-list or omits it; the removable
  set is applied to every link sharing the subdom+path key;
* quota selection (dispatcher.go:867-937): all getnow first, then
  ``idealUncrawled = numRemain - round(refresh% * numRemain)`` uncrawled
  in list order, then ``idealCrawled`` oldest-crawled, then backfill
  from either list; duplicate URLs (post-filter) skipped without
  consuming quota (the ``i--`` loops); ``round`` is half-away-from-zero
  (dispatcher.go:1007-1015).

Deterministic stand-ins for the reference's nondeterminism (documented
divergences, invisible to the reference's own tests):

* Go's unstable ``sort.Sort`` by decoded path (dispatcher.go:833-863)
  -> stable sort by decoded path (ties keep clustering order);
* heap pop ties on equal LastCrawled -> tie-break (time, path, subdom,
  proto);
* Go map iteration order over clusters -> insertion order.

``LinkList.Uniq()``'s result is discarded in the reference
(dispatcher.go:439-468 assigns to a by-value slice header), so lists are
NOT deduplicated here either; the observable dedup is ``alreadyAdded``
keyed on full URL plus the segments-table primary key collapsing
duplicate inserts (keep-last).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from walker_spark.functions import urlkernel


def go_round(f: float) -> int:
    """Go-style round half away from zero (dispatcher.go:1007-1015)."""
    if f < 0:
        return -go_round(-f)
    floor = int(f)
    return floor + 1 if f - floor >= 0.5 else floor


class _Link:
    __slots__ = ("subdom", "path", "proto", "time", "fnv_txt", "dec_path", "qpairs", "ord")

    def __init__(self, subdom, path, proto, time, fnv_txt, ord_):
        self.subdom = subdom
        self.path = path  # RequestURI (escaped path + query)
        self.proto = proto
        self.time = time  # int ms since epoch; 0 == NotYetCrawled
        self.fnv_txt = fnv_txt if fnv_txt is not None else 0
        self.ord = ord_
        # decoded path and query pairs, parsed once (URL.Path / URL.Query())
        p, _, q = path.partition("?")
        try:
            self.dec_path = urlkernel._unescape(p, plus_space=False).decode(
                "utf-8", "surrogateescape"
            )
        except urlkernel.URLParseError:
            self.dec_path = p
        self.qpairs = urlkernel.parse_query(q) if q else []

    def values(self) -> dict[str, list[str]]:
        byk: dict[str, list[str]] = defaultdict(list)
        for k, v in self.qpairs:
            byk[k].append(v)
        return byk

    def rewrite_without(self, removable: set[str]) -> None:
        if not removable or not self.qpairs:
            return
        kept = [(k, v) for (k, v) in self.qpairs if k not in removable]
        if len(kept) != len(self.qpairs):
            self.qpairs = kept
            enc = urlkernel.encode_query(kept)
            base = self.path.partition("?")[0]
            self.path = base + ("?" + enc if enc else "")

    def url_string(self, dom: str) -> str:
        return urlkernel.url_from_key(dom, self.subdom, self.path, self.proto)


def _cluster_and_filter(uncrawled: list[_Link], crawled: list[_Link]) -> None:
    """filterLinksByDuplicateContent (dispatcher.go:732-863), in place."""
    # buildDuplicateLinkClusters: (fnv_txt -> (subdom+dec_path -> [links]))
    clusters: dict[int, dict[str, list[_Link]]] = {}
    cluster_order: list[tuple[int, str]] = []
    for link_list in (uncrawled, crawled):
        for l in link_list:
            entry = clusters.setdefault(l.fnv_txt, {})
            key = l.subdom + l.dec_path
            if key not in entry:
                entry[key] = []
                cluster_order.append((l.fnv_txt, key))
            entry[key].append(l)

    # discoverRemoveableQueryParameters
    removable_by_path: dict[str, set[str]] = {}
    for fp, key in cluster_order:
        links = clusters[fp][key]
        if len(links) <= 1:
            continue
        removable: set[str] = set()
        compare = links[0].values()
        for l in links:
            current = l.values()
            for param, vals in current.items():
                if param in removable:
                    continue
                cmp_vals = compare.get(param)
                if cmp_vals is None or vals != cmp_vals:
                    removable.add(param)
            for param in compare:
                if param not in current:
                    removable.add(param)
        if removable:
            removable_by_path[key] = removable  # later clusters overwrite

    # filterLinksWithRules + stable path sort (Uniq is a reference no-op)
    for link_list in (uncrawled, crawled):
        for l in link_list:
            rules = removable_by_path.get(l.subdom + l.dec_path)
            if rules:
                l.rewrite_without(rules)
        link_list.sort(key=lambda l: l.dec_path)  # stable; Go sorts by URL.Path


def select_segment(
    dom: str,
    rows: list[tuple[str, str, str, int, bool, int | None]],
    max_links_per_segment: int,
    refresh_percentage: float,
    min_link_refresh_ms: int,
    now_ms: int,
) -> tuple[list[tuple[str, str, str, int]], int, int]:
    """One domain's dispatch decision.

    ``rows``: latest-per-URL links as (subdom, path, proto, time_ms,
    getnow, fnv_txt), already in clustering order; time_ms == 0 means
    not yet crawled. Returns (selection, tot_links, uncrawled_links)
    where selection is [(subdom, path, proto, time_ms)] in dispatch
    order (duplicates by key collapse keep-last at the segment sink)
    and the counts feed domain_info stats (dispatcher.go:977-990).
    """
    limit = max_links_per_segment
    getnow: list[_Link] = []
    uncrawled: list[_Link] = []
    crawled: list[_Link] = []
    tot = 0
    tot_uncrawled = 0

    for i, (subdom, path, proto, time_ms, is_getnow, fnv_txt) in enumerate(rows):
        tot += 1
        if time_ms == 0:
            tot_uncrawled += 1
        l = _Link(subdom, path, proto, time_ms, fnv_txt, i)
        if is_getnow:
            if len(getnow) < limit:  # early-exit scan cap (dispatcher.go:569-572)
                getnow.append(l)
        elif time_ms == 0:
            if len(uncrawled) < limit:  # cellPush cap (dispatcher.go:612-614)
                uncrawled.append(l)
        elif time_ms + min_link_refresh_ms < now_ms:  # F6 (dispatcher.go:617-620)
            crawled.append(l)

    _cluster_and_filter(uncrawled, crawled)

    # buildLinksToDispatch (dispatcher.go:867-937)
    dispatch: list[_Link] = list(getnow)
    already: set[str] = set()
    num_remain = limit - len(dispatch)
    if num_remain > 0:
        ideal_crawled = go_round(refresh_percentage / 100.0 * num_remain)
        ideal_uncrawled = num_remain - ideal_crawled

        heap = [(l.time, l.dec_path, l.subdom, l.proto, l.ord, l) for l in crawled]
        heapq.heapify(heap)

        ui = 0  # uncrawled cursor

        taken = 0
        while taken < ideal_uncrawled and ui < len(uncrawled) and len(dispatch) < limit:
            l = uncrawled[ui]
            ui += 1
            key = l.url_string(dom)
            if key in already:
                continue  # i-- : doesn't consume quota
            dispatch.append(l)
            already.add(key)
            taken += 1

        taken = 0
        while taken < ideal_crawled and heap and len(dispatch) < limit:
            l = heapq.heappop(heap)[-1]
            key = l.url_string(dom)
            if key in already:
                continue
            dispatch.append(l)
            already.add(key)
            taken += 1

        while ui < len(uncrawled) and len(dispatch) < limit:
            l = uncrawled[ui]
            ui += 1
            key = l.url_string(dom)
            if key in already:
                continue
            dispatch.append(l)
            already.add(key)

        while heap and len(dispatch) < limit:
            l = heapq.heappop(heap)[-1]
            key = l.url_string(dom)
            if key in already:
                continue
            dispatch.append(l)
            already.add(key)

    selection = [(l.subdom, l.path, l.proto, l.time) for l in dispatch]
    return selection, tot, tot_uncrawled
