"""HTML rendering for the HTTP console — the reference console's web UI
re-expressed with stdlib string templates (reference
console/templates/*.tmpl: layout.tmpl nav + list / find / links /
findLinks / filterLinks / add / historical pages; rendering.go). Same
routes, same accessors, content-negotiated: the JSON API
(:mod:`console_http`) remains the programmatic surface; a browser
(``Accept: text/html``) gets these pages. No JS framework, no template
engine — every page is a pure function of the JSON payload the route
already produces, so the two surfaces cannot drift.
"""

from __future__ import annotations

import urllib.parse
from html import escape

# layout.tmpl nav entries (Walker Console brand + page links)
NAV = [
    ("/list", "List"),
    ("/find", "Find Domains"),
    ("/findLinks", "Find Links"),
    ("/filterLinks", "Filter Links"),
    ("/add", "Add Links"),
]

# served as a static asset at /public/css/console.css (reference
# console/public/css), <link>ed by every page
STYLESHEET = """
body { font-family: sans-serif; margin: 0; background: #fafafa; color: #222; }
nav { background: #222; padding: 0.6em 1em; }
nav a { color: #eee; margin-right: 1.2em; text-decoration: none; }
nav a.brand { font-weight: bold; }
main { padding: 1em 1.5em; }
table { border-collapse: collapse; margin: 0.8em 0; background: #fff; }
th, td { border: 1px solid #ccc; padding: 0.3em 0.7em; text-align: left; }
th { background: #eee; }
tr:nth-child(even) td { background: #f6f6f6; }
.alert { background: #fdd; border: 1px solid #c99; padding: 0.6em 1em; }
form.inline { display: inline; }
textarea { width: 40em; height: 8em; }
input[type=text] { padding: 0.25em 0.4em; }
button, input[type=submit] { padding: 0.25em 0.9em; cursor: pointer; }
""".strip()


def _page(title: str, body: str) -> str:
    nav = '<a class="brand" href="/">Walker Console</a>' + "".join(
        f'<a href="{href}">{escape(label)}</a>' for href, label in NAV
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{escape(title)} - Walker Console</title>"
        '<link rel="stylesheet" href="/public/css/console.css">'
        "</head><body>"
        f"<nav>{nav}</nav><main><h2>{escape(title)}</h2>{body}</main>"
        "</body></html>"
    )


def _cell(v) -> str:
    return escape("" if v is None else str(v))


def _table(
    rows: list[dict],
    link_col: str | None = None,
    link_to=None,
    raw_cols: frozenset[str] = frozenset(),
) -> str:
    if not rows:
        return "<p><em>no rows</em></p>"
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    head = "".join(f"<th>{escape(c)}</th>" for c in cols)
    body = []
    for r in rows:
        tds = []
        for c in cols:
            raw = r.get(c)
            v = str(raw or "") if c in raw_cols else _cell(raw)
            if c == link_col and link_to is not None:
                v = f'<a href="{link_to(r)}">{v}</a>'
            tds.append(f"<td>{v}</td>")
        body.append("<tr>" + "".join(tds) + "</tr>")
    return f"<table><tr>{head}</tr>{''.join(body)}</table>"


def _alert(payload: dict) -> str:
    msg = payload.get("error") or payload.get("message") or "request failed"
    return f'<div class="alert">{escape(str(msg))}</div>'


def _dom_actions(dom: str) -> str:
    q = urllib.parse.quote(dom)
    return (
        f'<form class="inline" method="POST" action="/excludeToggle/{q}/ex">'
        f"<button>exclude</button></form> "
        f'<form class="inline" method="POST" action="/excludeToggle/{q}/un">'
        f"<button>include</button></form> "
        f'<form class="inline" method="POST" action="/changePriority">'
        f'<input type="hidden" name="domain" value="{escape(dom)}">'
        f'<input type="number" name="priority" min="1" max="100" '
        f'style="width:4em" placeholder="prio">'
        f"<button>set priority</button></form>"
    )


def _find_form(action: str, field: str, label: str) -> str:
    return (
        f'<form method="GET" action="{action}">'
        f"<label>{escape(label)}: "
        f'<input name="{field}" size="50"></label> <button>find</button></form>'
    )


def render(method: str, path: str, status: int, payload: dict) -> str:
    """One HTML page per (route, payload) — the payload is exactly what
    the JSON surface returns for the same request."""
    parts = [p for p in path.split("/") if p]
    head = parts[0] if parts else ""
    body = "" if status < 400 else _alert(payload)

    if not parts and status == 200:  # home.tmpl
        routes = "".join(
            f"<li><code>{escape(r)}</code></li>" for r in payload.get("routes", [])
        )
        versions = [
            {"table": t, "version": v}
            for t, v in sorted(payload.get("table_versions", {}).items())
        ]
        return _page(
            "Walker Console",
            f"<ul>{routes}</ul><h3>Table versions</h3>{_table(versions)}",
        )

    if head == "list" and status == 200:  # list.tmpl
        rows = payload.get("domains", [])
        for r in rows:
            r["actions"] = _dom_actions(r.get("dom", ""))
        tbl = _table(
            rows,
            link_col="dom",
            link_to=lambda r: "/links/" + urllib.parse.quote(r.get("dom", "")),
            raw_cols=frozenset({"actions"}),
        )
        nxt = payload.get("next_seed")
        more = (
            f'<p><a href="/list/{urllib.parse.quote(nxt)}">next page &raquo;</a></p>'
            if nxt
            else ""
        )
        return _page("List of Domains", body + tbl + more)

    if head == "find":  # find.tmpl
        found = (
            _table([payload["domain"]]) + _dom_actions(payload["domain"].get("dom", ""))
            if status == 200 and "domain" in payload
            else ""
        )
        return _page(
            "Find Domains", _find_form("/find", "domain", "Domain") + body + found
        )

    if head == "links" and status == 200:  # links.tmpl
        dom = payload.get("dom", "")
        tbl = _table(payload.get("links", []))
        nxt = payload.get("next_seed_url")
        more = (
            f'<p><a href="/links/{urllib.parse.quote(dom)}?seed='
            f'{urllib.parse.quote(nxt, safe="")}">next page &raquo;</a></p>'
            if nxt
            else ""
        )
        flt = (
            f'<form method="POST" action="/filterLinks">'
            f'<input type="hidden" name="domain" value="{escape(dom)}">'
            f'<label>filter regex: <input name="regex" size="30"></label>'
            f"<button>apply</button></form>"
        )
        return _page(f"Links for {dom}", flt + tbl + more)

    if head == "historical" and status == 200:
        return _page(
            f"History for {payload.get('url', '')}",
            _table(payload.get("history", [])),
        )

    if head == "findLinks":  # findLinks.tmpl
        found = _table([payload["link"]]) if status == 200 and "link" in payload else ""
        return _page(
            "Find Links", _find_form("/findLinks", "url", "URL") + body + found
        )

    if head in ("add", "rest"):  # add.tmpl
        form = (
            '<form method="POST" action="/add">'
            "<p>One URL per line:</p>"
            '<textarea name="links"></textarea><br><button>add links</button></form>'
        )
        result = ""
        if method == "POST" and status == 200:
            result = "<p>added:</p>" + _table(
                [{"url": u} for u in payload.get("added", [])]
            ) if "added" in payload else _table([payload])
        return _page("Add Links", form + body + result)

    if head == "filterLinks":  # filterLinks.tmpl (GET form; POST 303s)
        form = (
            '<form method="POST" action="/filterLinks">'
            '<label>domain: <input name="domain" size="30"></label> '
            '<label>regex: <input name="regex" size="30"></label> '
            "<button>filter</button></form>"
        )
        return _page("Filter Links", form + body)

    if head in ("excludeToggle", "changePriority") and status == 200:
        return _page("Domain updated", _table([payload.get("domain") or payload]))

    # serverError.tmpl / unknown route
    return _page(f"{status}", body or _alert(payload))
