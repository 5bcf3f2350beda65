"""Read-write HTTP console over the console accessors (reference:
console/controllers.go:32-50 route table, console/rest.go:23-28,
console/lifecycle.go:111-229 Start/Stop).

The reference's console is an HTML-template web app; this analog serves
the SAME route surface, content-negotiated: ``Accept: text/html``
(a browser) gets the web pages (:mod:`console_html`, the
console/templates/*.tmpl analog, incl. classic-form POSTs in
``application/x-www-form-urlencoded``), anything else gets JSON. The
accessors in :mod:`walker_spark.operators.console` are the controllers'
data layer (datastore.go:538-1078). It is a driver-side convenience
view and stays OUT of the superstep path: every handler is a bounded,
partition-pruned read (or a tiny seed-path write), never a
frontier-scale job.

Routes (GET unless noted):

    /                               home: route list + table versions
    /list[/{seed}]                  ListDomainsController — keyset page
    /find?domain=D                  FindDomainController
    /links/{domain}[?seed=URL]      LinksController — keyset page
    /links/{domain}?filterRegex=R   FilterLinksController target
    /historical/{url}               LinksHistoricalController
    /findLinks?url=U                FindLinksController — latest row
    /add            POST {"links":[{"url": ...}]}  AddLinkIndex
    /rest/add       POST — same body, rest.go:51-102 parity
    /excludeToggle/{domain}/{ex|un}  POST — controllers.go:734-762
    /changePriority POST {"domain": D, "priority": N} — :765-826
    /filterLinks    POST {"domain": D, "regex": R} — :828-886 (validates
                    then redirects to /links/{domain}?filterRegex=...)

Threading: stdlib ``ThreadingHTTPServer``; handlers call Spark through
the store's single driver session, serialized by a lock (the console is
an operator surface, not a throughput path).
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from walker_spark.config import WalkerConfig
from walker_spark.operators import console
from walker_spark.sources.store import FrontierStore

# controllers.go:809-813 / config.go:176 — priority ceiling
MAX_ALLOWED_DOMAIN_PRIORITY = 100

# keep page sizes bounded like the reference's PageWindowLength
DEFAULT_LIMIT = 50


def _rows_json(df) -> list[dict]:
    """Bounded DataFrame -> JSON-safe row dicts (timestamps ISO,
    bytes dropped)."""
    out = []
    for r in df.collect():
        d = {}
        for k, v in r.asDict(recursive=True).items():
            if hasattr(v, "isoformat"):
                v = v.isoformat(sep=" ")
            elif isinstance(v, (bytes, bytearray)):
                v = f"<{len(v)} bytes>"
            d[k] = v
        out.append(d)
    return out


class ConsoleApp:
    """Route dispatch decoupled from the socket so tests can call
    handlers directly; one lock serializes Spark access."""

    def __init__(self, store: FrontierStore, cfg: WalkerConfig | None = None):
        self.store = store
        self.cfg = cfg or WalkerConfig()
        self.lock = threading.Lock()

    # each handler returns (status, payload-dict)

    def home(self) -> tuple[int, dict]:
        return 200, {
            "service": "walker-spark console",
            "routes": [
                "/", "/list[/{seed}]", "/find?domain=", "/links/{domain}",
                "/historical/{url}", "/findLinks?url=", "/add",
                "/rest/add", "/excludeToggle/{domain}/{ex|un}",
                "/changePriority", "/filterLinks",
            ],
            "table_versions": self.store.versions(),
        }

    def list_domains(self, seed: str = "", limit: int = DEFAULT_LIMIT):
        with self.lock:
            rows = _rows_json(console.list_domains(self.store, seek_dom=seed, limit=limit))
        return 200, {"domains": rows, "next_seed": rows[-1]["dom"] if rows else None}

    def find_domain(self, dom: str):
        with self.lock:
            rows = _rows_json(console.find_domain(self.store, dom))
        if not rows:
            return 404, {"error": f"domain {dom!r} not found"}
        return 200, {"domain": rows[0]}

    def links(self, dom: str, seed_url: str | None = None,
              filter_regex: str | None = None, limit: int = DEFAULT_LIMIT):
        seek = None
        if seed_url:
            key = _url_key(seed_url)
            if key is None:
                return 400, {"error": f"bad seed url {seed_url!r}"}
            seek = (key[1], key[2], key[3])
        if filter_regex is not None:
            try:
                re.compile(filter_regex)
            except re.error as e:
                return 400, {"error": f"bad regex {filter_regex!r}: {e}"}
        with self.lock:
            df = console.list_links(self.store, dom, seek=seek, limit=limit)
            if filter_regex is not None:
                # reference filters on the assembled link text
                # (FilterLinksController -> LinksController filterRegex)
                df = df.filter(
                    F.concat(F.col("subdom"), F.col("dom"), F.col("path")).rlike(
                        filter_regex
                    )
                )
            rows = _rows_json(df)
        nxt = None
        nxt_url = None
        if rows:
            last = rows[-1]
            nxt = {"subdom": last["subdom"], "path": last["path"], "proto": last["proto"]}
            from walker_spark.functions import urlkernel

            nxt_url = urlkernel.url_from_key(
                dom, last["subdom"], last["path"], last["proto"]
            )
        return 200, {
            "dom": dom,
            "links": rows,
            "next_seek": nxt,
            "next_seed_url": nxt_url,
        }

    def historical(self, url: str):
        key = _url_key(url)
        if key is None:
            return 400, {"error": f"bad url {url!r}"}
        with self.lock:
            rows = _rows_json(console.link_history(self.store, *key))
        return 200, {"url": url, "history": rows}

    def find_links(self, url: str):
        key = _url_key(url)
        if key is None:
            return 400, {"error": f"bad url {url!r}"}
        with self.lock:
            rows = _rows_json(console.link_history(self.store, *key).limit(1))
        if not rows:
            return 404, {"error": f"link {url!r} not found"}
        return 200, {"link": rows[0]}

    def add_links(self, body: dict):
        links = [l.get("url", "") for l in body.get("links", [])]
        if not links:
            return 400, {"version": 1, "tag": "empty-links",
                         "message": "No links provided to add"}
        if any(not u for u in links):
            return 400, {"version": 1, "tag": "bad-link-element",
                         "message": "No URL provided for link"}
        with self.lock:
            out = console.insert_links(self.store, links, self.cfg)
        return 200, out

    def exclude_toggle(self, dom: str, direction: str):
        if direction not in ("ex", "un"):
            return 400, {"error": f"bad direction {direction!r} (ex|un)"}
        with self.lock:
            if direction == "ex":
                console.set_domain_excluded(self.store, dom, True, "Manual exclude")
            else:
                console.set_domain_excluded(self.store, dom, False)
            rows = _rows_json(console.find_domain(self.store, dom))
        return 200, {"domain": rows[0] if rows else None}

    def change_priority(self, body: dict):
        dom = body.get("domain", "")
        if not dom:
            return 400, {"error": "domain is required"}
        try:
            priority = int(body["priority"])
        except (KeyError, TypeError, ValueError):
            return 400, {"error": "priority must be an integer"}
        if priority <= 0:
            return 400, {"error": f"priority must be > 0, not {priority}"}
        if priority > MAX_ALLOWED_DOMAIN_PRIORITY:
            return 400, {
                "error": f"priority must be <= {MAX_ALLOWED_DOMAIN_PRIORITY}, not {priority}"
            }
        with self.lock:
            found = console.set_domain_priority(self.store, dom, priority)
        if not found:
            return 404, {"error": f"domain {dom!r} not found"}
        return 200, {"domain": dom, "priority": priority}

    def filter_links(self, body: dict):
        dom = body.get("domain")
        regex = body.get("regex")
        if dom is None or regex is None:
            return 400, {"error": "domain and regex are required"}
        with self.lock:
            found = console.find_domain(self.store, dom).count() > 0
        if not found:
            return 404, {"error": f"domain {dom!r} not found"}
        try:
            re.compile(regex)
        except re.error as e:
            return 400, {"error": f"bad regex {regex!r}: {e}"}
        loc = f"/links/{urllib.parse.quote(dom)}?filterRegex={urllib.parse.quote(regex)}"
        return 303, {"location": loc}

    # ---- request dispatch ---------------------------------------------

    def dispatch(self, method: str, path: str, query: dict, body: dict):
        parts = [p for p in path.split("/") if p]
        q1 = lambda k, d=None: query.get(k, [d])[0]  # noqa: E731
        try:
            limit = int(q1("limit", DEFAULT_LIMIT))
        except (TypeError, ValueError):
            return 400, {"error": f"limit must be an integer, not {q1('limit')!r}"}
        if method == "GET":
            if parts == ["public", "css", "console.css"]:
                # static stylesheet (reference console/public/css) —
                # the HTML pages <link> it instead of inlining styles
                from walker_spark.operators import console_html

                return 200, {"_static": console_html.STYLESHEET,
                             "_ctype": "text/css; charset=utf-8"}
            if not parts:
                return self.home()
            if parts[0] == "list":
                seed = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
                return self.list_domains(seed=seed, limit=limit)
            if parts[0] == "find":
                if "domain" not in query:
                    return 200, {"form": "find"}
                return self.find_domain(q1("domain", ""))
            if parts[0] == "links" and len(parts) >= 2:
                seed_url = (
                    urllib.parse.unquote(parts[2]) if len(parts) > 2 else q1("seed")
                )
                return self.links(
                    urllib.parse.unquote(parts[1]),
                    seed_url=seed_url,
                    filter_regex=q1("filterRegex"),
                    limit=limit,
                )
            if parts[0] == "historical" and len(parts) >= 2:
                return self.historical(urllib.parse.unquote("/".join(parts[1:])))
            if parts[0] == "findLinks":
                if "url" not in query:
                    return 200, {"form": "findLinks"}
                return self.find_links(q1("url", ""))
            if parts[0] in ("add", "filterLinks"):
                # form pages (the HTML surface renders an input form; a
                # JSON caller gets this stub — the mutation is POST-only)
                return 200, {"form": parts[0]}
        elif method == "POST":
            if not isinstance(body, dict):
                # json.loads accepts '[1]' or '"x"'; the routes all take
                # an object — reject instead of AttributeError-ing to 500
                return 400, {"error": "POST body must be a JSON object"}
            if parts == ["add"] or parts == ["rest", "add"]:
                # the reference exposes exactly /rest/add (routes.go), not
                # arbitrary /rest/* paths
                return self.add_links(body)
            if parts and parts[0] == "excludeToggle" and len(parts) == 3:
                return self.exclude_toggle(
                    urllib.parse.unquote(parts[1]), parts[2]
                )
            if parts and parts[0] == "changePriority":
                return self.change_priority(body)
            if parts and parts[0] == "filterLinks":
                return self.filter_links(body)
        return 404, {"error": f"no route for {method} {path}"}


def _url_key(url: str):
    from walker_spark.functions import urlkernel

    norm = urlkernel.normalize_url(url)
    return urlkernel.primary_key(norm) if norm is not None else None


def _form_body(path: str, raw: bytes) -> dict:
    """HTML-form POST body -> the same dict shape the JSON routes take
    (the web pages in :mod:`console_html` submit classic forms)."""
    fields = {
        k: v[0] for k, v in urllib.parse.parse_qs(raw.decode(errors="replace")).items()
    }
    if path.lstrip("/").split("/")[0] in ("add", "rest"):
        urls = [u.strip() for u in fields.get("links", "").splitlines() if u.strip()]
        return {"links": [{"url": u} for u in urls]}
    return fields


def make_server(
    store: FrontierStore,
    cfg: WalkerConfig | None = None,
    host: str = "127.0.0.1",
    port: int = 3000,
) -> ThreadingHTTPServer:
    """Bound-but-not-serving HTTP server (reference default port 3000,
    config.go Console.Port). Call ``serve_forever()`` (or ``serve``
    below); ``shutdown()`` stops it — lifecycle.go Start/Stop."""
    app = ConsoleApp(store, cfg)

    class Handler(BaseHTTPRequestHandler):
        def _wants_html(self) -> bool:
            # browsers lead with text/html; API callers send */* or
            # application/json and keep the JSON surface
            return "text/html" in (self.headers.get("Accept") or "")

        def _reply(self):
            parsed = urllib.parse.urlparse(self.path)
            query = urllib.parse.parse_qs(parsed.query)
            body = {}
            if self.command == "POST":
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b""
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if raw:
                    # JSON first regardless of Content-Type (urllib and
                    # curl default form-encoded on raw JSON posts);
                    # genuine form submissions from the HTML pages never
                    # parse as JSON
                    try:
                        body = json.loads(raw)
                    except json.JSONDecodeError as e:
                        if ctype == "application/x-www-form-urlencoded":
                            body = _form_body(parsed.path, raw)
                        else:
                            self._send(400, {"version": 1, "tag": "bad-json-decode",
                                             "message": str(e)}, parsed.path)
                            return
            try:
                status, payload = app.dispatch(self.command, parsed.path, query, body)
            except Exception as e:  # replyServerError analog
                status, payload = 500, {"error": str(e)}
            self._send(status, payload, parsed.path)

        def _send(self, status: int, payload: dict, path: str = "/"):
            if isinstance(payload, dict) and "_static" in payload:
                data = payload["_static"].encode()
                self.send_response(status)
                self.send_header("Content-Type", payload["_ctype"])
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            if self._wants_html() and status != 303:
                from walker_spark.operators import console_html

                data = console_html.render(
                    self.command, path, status, payload
                ).encode()
                ctype = "text/html; charset=utf-8"
            else:
                data = json.dumps(payload).encode()
                ctype = "application/json"
            self.send_response(status)
            if status == 303:
                self.send_header("Location", payload.get("location", "/"))
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        do_GET = _reply
        do_POST = _reply

        def log_message(self, fmt, *args):  # quiet test output
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(store: FrontierStore, cfg: WalkerConfig | None = None,
          host: str = "127.0.0.1", port: int = 3000) -> None:
    srv = make_server(store, cfg, host, port)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
