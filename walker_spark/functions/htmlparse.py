"""HTML text + outlink extraction kernel.

Reimplements the reference parser's observable behavior
(reference: parse.go:22-312) with Python's stdlib tokenizer:

* **Text** — concatenation of whitespace-trimmed text tokens, skipping
  anything inside ``<script>``/``<style>`` (tracked with a parent-tag
  counter), non-empty chunks joined with ``"\\n\\n"`` (parse.go:62-76).
  Byte-identical output is the parity invariant; goldens from
  fetcher_test.go:1266, 1326.
* **Links** — from ``a[href]`` (every href attr), ``embed[src]``,
  ``object[data]``, ``iframe[src]`` / ``iframe[srcdoc]`` (srcdoc is
  recursively parsed), and ``meta http-equiv=refresh`` URLs; the tag
  set is reduced by ``ignore_tags`` (parse.go:89-113,135-154). Each
  candidate is parse+normalized before being recorded.
* **meta robots** — ``noindex``/``nofollow`` substring match on the
  lowercased content attr (parse.go:217-259). Once nofollow is seen,
  *subsequent* a/embed/object/iframe-src links stop being collected
  regardless of config (parse.go:92-110) — honoring nofollow for the
  whole page is the fetcher's job, not the parser's.
* **Charset** — BOM, then a <meta> prescan of the first 1024 bytes,
  else windows-1252, mirroring WHATWG sniffing as used via
  x/net/html/charset (parse.go:43-47).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser as _PyHTMLParser

from walker_spark.functions.urlkernel import DEFAULT_PURGE_SIDS, normalize_url

DEFAULT_IGNORE_TAGS = ("script", "img", "link")

# tags checked for outlinks before ignore_tags removal (parse.go:135-154);
# only a/embed/iframe/object/meta have extraction logic.
_LINK_TAGS = {"a", "area", "form", "frame", "iframe", "script", "link", "img", "object", "embed"}

_META_REFRESH_RE = re.compile(r"^\s*\d+;\s*url=(.*)", re.DOTALL)

# --- charset sniffing -------------------------------------------------------

_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "cp1252",  # WHATWG maps latin-1 to windows-1252
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "iso-8859-15": "iso-8859-15",
    "windows-1251": "cp1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc-jp",
    "gbk": "gbk",
    "gb2312": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc-kr",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([\w.:-]+)""", re.IGNORECASE)


def sniff_charset(body: bytes) -> str:
    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        return "utf-16"  # python utf-16 codec consumes the BOM
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        enc = _CHARSET_ALIASES.get(name)
        if enc:
            return enc
    return "cp1252"


def decode_html(body: bytes) -> str:
    return body.decode(sniff_charset(body), errors="replace")


# --- tokenizer --------------------------------------------------------------


@dataclass
class ParseResult:
    text: str = ""
    links: list = field(default_factory=list)  # normalized URL strings
    meta_noindex: bool = False
    meta_nofollow: bool = False


class _Tokenizer(_PyHTMLParser):
    """Event-level replica of the reference's tokenizer loop
    (parse.go:54-129). convert_charrefs gives entity-decoded text runs,
    and script/style contents arrive as raw CDATA we drop."""

    def __init__(self, result: ParseResult, cfg):
        super().__init__(convert_charrefs=True)
        self.r = result
        self.cfg = cfg
        self.parent_tags: dict[str, int] = {}
        self.chunks: list[str] = []
        tags = set(_LINK_TAGS)
        for t in cfg.ignore_tags:
            tags.discard(t)
        tags.add("meta")
        self.link_tags = tags

    # -- text (parse.go:62-76) --
    def handle_data(self, data: str):
        if "script" in self.parent_tags or "style" in self.parent_tags:
            return
        txt = data.strip()
        if txt:
            self.chunks.append(txt)

    # -- tags --
    def handle_starttag(self, tag: str, attrs):
        self.parent_tags[tag] = self.parent_tags.get(tag, 0) + 1
        self._dispatch(tag, attrs)

    def handle_startendtag(self, tag: str, attrs):
        # SelfClosingTagToken: no parent-tag increment (parse.go:81-88)
        self._dispatch(tag, attrs)

    def handle_endtag(self, tag: str):
        num = self.parent_tags.get(tag)
        if num is None:
            pass  # more end tags than start tags: ignored (parse.go:120-122)
        elif num > 1:
            self.parent_tags[tag] = num - 1
        else:
            del self.parent_tags[tag]

    def _dispatch(self, tag: str, attrs):
        if not attrs or tag not in self.link_tags:
            return
        if tag == "a":
            if not self.r.meta_nofollow:
                for k, v in attrs:
                    if k == "href" and v is not None:
                        self._add_link(v.strip())
        elif tag == "embed":
            if not self.r.meta_nofollow:
                for k, v in attrs:
                    if k == "src":
                        if v is not None:
                            self._add_link(v.strip())
                        return
        elif tag == "object":
            for k, v in attrs:
                if k == "data":
                    if v is not None:
                        self._add_link(v.strip())
                    return
        elif tag == "iframe":
            self._iframe(attrs)
        elif tag == "meta":
            self._meta(attrs)

    def _add_link(self, raw: str):
        u = normalize_url(raw, self.cfg.purge_sid_list)
        if u is not None:
            self.r.links.append(u)

    # -- iframe src/srcdoc (parse.go:171-215) --
    def _iframe(self, attrs):
        src = None
        srcdoc = None
        for k, v in attrs:
            if k == "src":
                src, is_doc = v or "", False
                break
            if k == "srcdoc":
                srcdoc, is_doc = v or "", True
                break
        else:
            return  # neither attribute found
        if srcdoc is not None:
            sub = parse_html_str(srcdoc, self.cfg)
            if not self.cfg.honor_meta_nofollow or not (sub.meta_nofollow or self.r.meta_nofollow):
                self.r.links.extend(sub.links)
        elif not self.r.meta_nofollow:
            self._add_link(src)

    # -- meta robots / refresh (parse.go:217-259) --
    def _meta(self, attrs):
        content = None
        http_equiv = None
        is_robots = no_index = no_follow = False
        for k, v in attrs:
            v = v or ""
            if k == "name":
                is_robots = v.lower() == "robots"
            elif k == "content":
                content = v.lower()
                no_index = "noindex" in content
                no_follow = "nofollow" in content
            elif k == "http-equiv":
                http_equiv = v.lower()
        if http_equiv == "refresh" and content is not None:
            m = _META_REFRESH_RE.match(content)
            if m:
                self._add_link(m.group(1).strip())
        if is_robots:
            self.r.meta_noindex = self.r.meta_noindex or no_index
            self.r.meta_nofollow = self.r.meta_nofollow or no_follow


class _ParserCfg:
    __slots__ = ("ignore_tags", "honor_meta_nofollow", "purge_sid_list")

    def __init__(self, ignore_tags=DEFAULT_IGNORE_TAGS, honor_meta_nofollow=False,
                 purge_sid_list=DEFAULT_PURGE_SIDS):
        self.ignore_tags = ignore_tags
        self.honor_meta_nofollow = honor_meta_nofollow
        self.purge_sid_list = purge_sid_list


def parse_html_str(html: str, cfg: _ParserCfg | None = None) -> ParseResult:
    cfg = cfg or _ParserCfg()
    r = ParseResult()
    tok = _Tokenizer(r, cfg)
    try:
        tok.feed(html)
        tok.close()
    except Exception:
        pass  # parse errors finish with whatever was found (parse.go:33-36)
    r.text = "\n\n".join(tok.chunks)
    return r


def parse_html(body: bytes, cfg: _ParserCfg | None = None) -> ParseResult:
    """Decode + parse one page (the mapInPandas kernel's per-row core)."""
    return parse_html_str(decode_html(body), cfg)


def parser_cfg(ignore_tags=DEFAULT_IGNORE_TAGS, honor_meta_nofollow=False,
               purge_sid_list=DEFAULT_PURGE_SIDS) -> _ParserCfg:
    return _ParserCfg(tuple(ignore_tags), honor_meta_nofollow, tuple(purge_sid_list))
