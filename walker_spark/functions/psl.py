"""Public-suffix-list lookups: effective TLD+1 and subdomain.

Reimplements the semantics the reference gets from
code.google.com/p/go.net/publicsuffix (reference: url.go:169-208):
``tld_plus_one("www.bbc.co.uk") == "bbc.co.uk"``,
``subdomain("www.bbc.co.uk") == "www"``.

The matching algorithm is the published publicsuffix.org algorithm:
the prevailing rule is the longest matching rule; exception rules
(``!``) beat wildcard rules (``*``); if nothing matches the prevailing
rule is ``*`` (the bare TLD is the suffix). eTLD+1 = the matched public
suffix plus one more label.

We embed a static snapshot of the most common suffixes (enough for any
synthetic corpus and typical crawl seeds); ``load_psl(path)`` swaps in
a full publicsuffix.org ``public_suffix_list.dat`` when one is
available. The embedded table is data, not code — no third-party
package needed on executors.
"""

from __future__ import annotations

# A compact snapshot of common publicsuffix.org rules. Extend freely;
# format is identical to the PSL file (one rule per line).
_EMBEDDED_RULES = """
com org net edu gov mil int info biz name mobi pro aero coop museum
io co me tv us cc ws dev app page xyz site online store tech blog news
cloud ai id ly sh to fm am gg
uk co.uk org.uk net.uk ac.uk gov.uk me.uk ltd.uk plc.uk sch.uk nhs.uk
au com.au net.au org.au edu.au gov.au asn.au id.au
jp co.jp ne.jp or.jp ac.jp go.jp ad.jp ed.jp gr.jp lg.jp
nz co.nz net.nz org.nz ac.nz govt.nz
za co.za net.za org.za web.za ac.za gov.za
in co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in res.in
il co.il org.il net.il ac.il gov.il muni.il
kr co.kr ne.kr or.kr re.kr pe.kr go.kr ac.kr
cn com.cn net.cn org.cn gov.cn edu.cn ac.cn
tw com.tw net.tw org.tw edu.tw gov.tw idv.tw
br com.br net.br org.br gov.br edu.br blog.br
mx com.mx net.mx org.mx edu.mx gob.mx
ar com.ar net.ar org.ar edu.ar gob.ar
tr com.tr net.tr org.tr edu.tr gov.tr
ua com.ua net.ua org.ua edu.ua gov.ua in.ua
ru com.ru org.ru net.ru pp.ru msk.ru spb.ru
de fr it nl es se no fi dk pl pt ch at be cz gr hu ie is li lu lv lt
ee sk si ro bg hr rs ba mk mt cy
ca eu asia tel jobs travel cat post
"""


class PublicSuffixList:
    def __init__(self, rules: list[str]):
        self._exact: set[str] = set()
        self._wildcard: set[str] = set()  # rule "*.foo" stored as "foo"
        self._exception: set[str] = set()  # rule "!bar.foo" stored as "bar.foo"
        for r in rules:
            r = r.strip().lower()
            if not r or r.startswith("//"):
                continue
            if r.startswith("!"):
                self._exception.add(r[1:])
            elif r.startswith("*."):
                self._wildcard.add(r[2:])
            else:
                self._exact.add(r)

    def fingerprint(self) -> str:
        """Stable hash of the active rule set. eTLD+1 derivations are
        only comparable when made under the same PSL: persisted
        dom-keyed state (frontier keys, robots_rules dom pruning)
        embeds this in its cache keys so a load_psl() swap between
        seeding and a rebuild invalidates instead of silently
        mismatching."""
        import hashlib

        payload = "\n".join(
            sorted(self._exact)
            + sorted("*." + w for w in self._wildcard)
            + sorted("!" + e for e in self._exception)
        )
        return hashlib.md5(payload.encode()).hexdigest()

    def public_suffix(self, host: str) -> str:
        """Longest matching public suffix of ``host`` (never raises)."""
        host = host.lower().rstrip(".")
        labels = host.split(".")
        # walk from the shortest candidate suffix to the longest
        best = labels[-1]  # default rule "*": bare TLD
        for i in range(len(labels) - 1, -1, -1):
            cand = ".".join(labels[i:])
            if cand in self._exception:
                # exception rule: suffix is the rule minus its leftmost label
                return cand.split(".", 1)[1]
            if cand in self._exact:
                best = cand
            parent = ".".join(labels[i + 1 :])
            if parent and parent in self._wildcard:
                best = cand
        return best

    def tld_plus_one(self, host: str) -> str | None:
        """eTLD+1, or None when it cannot be derived (host == suffix,
        empty host, leading dot) — mirrors publicsuffix
        EffectiveTLDPlusOne returning an error (url.go:175-177)."""
        if not host or host != host.strip(".") or ".." in host:
            return None
        suffix = self.public_suffix(host)
        if len(host) <= len(suffix):
            return None
        rest = host[: -len(suffix) - 1]
        if not rest:
            return None
        return rest.rsplit(".", 1)[-1] + "." + suffix


_DEFAULT = PublicSuffixList(_EMBEDDED_RULES.split())


def load_psl(path: str) -> None:
    """Replace the embedded snapshot with a full PSL file."""
    global _DEFAULT
    with open(path, encoding="utf-8") as f:
        _DEFAULT = PublicSuffixList(f.read().split("\n"))


def tld_plus_one(host: str) -> str | None:
    return _DEFAULT.tld_plus_one(host)


def fingerprint() -> str:
    """Fingerprint of the ACTIVE PSL (see PublicSuffixList.fingerprint)."""
    return _DEFAULT.fingerprint()


def subdomain(host: str) -> str | None:
    """Subdomain left of the eTLD+1, '' when none, None on error
    (reference: url.go:183-192)."""
    dom = tld_plus_one(host)
    if dom is None:
        return None
    if len(host) == len(dom):
        return ""
    return host[: -len(dom) - 1] if host.endswith("." + dom) else None
