"""Minimal REST serving front — endpoint parity with the reference's web
service (query-war/src/main/webapp/WEB-INF/web.xml:33-40):

    GET /query?query=<jexl>&auths=en,fr[&limit=N][&ids=1]   (≈ /Query/json)
    GET /query/{json|xml|yaml|html}?query=…                  (format routes,
        the reference's ``/Query/{xml|json|yaml|html}``; Query.java:94-138
        renders via JAXB/XSLT — here each format renders the same
        Results→Document→Field shape)
    GET /content?pointer=DOCUMENT:partition/lang/id          (≈ /Content)
    GET /scored?term=<term>[&limit=N]
    GET /phrase?terms=<t1,t2,…>[&limit=N]
    GET /bm25?terms=<t1,t2,…>[&limit=N]
    GET /morelike?doc_id=<id>[&limit=N]
    GET /explain?query=<jexl>
    GET /health
    GET / (or /ui)                                           (≈ ui.html — the
        search form: query input, per-language auth checkboxes from the
        index metadata, results iframe fed by /query/html)

Default responses are JSON: {"results": [...], "count": N}. Stdlib
``http.server`` only — serving is I/O-light (Spark does the work); a
production deployment would front the same engine object with any ASGI
server. The engine and its SparkSession are thread-safe for concurrent read
queries (independent jobs against the shared cached catalog — the
BatchScanner-pool analogue)."""

from __future__ import annotations

import html as _html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse
from xml.etree import ElementTree as ET


# --- format renderers (Results → bytes + content-type) ---------------------


def _render_json(payload: dict) -> tuple[bytes, str]:
    return json.dumps(payload).encode(), "application/json"


def _render_xml(payload: dict) -> tuple[bytes, str]:
    """<results count="N"><document>…<field name="…">value</field>…</document></results>
    — the JAXB Results/Document/Field element shape (sample/Results.java)."""
    root = ET.Element("results", {"count": str(payload.get("count", 0))})
    for row in payload.get("results", []):
        doc = ET.SubElement(root, "document")
        for k, v in row.items():
            if isinstance(v, dict):
                for fk, fv in sorted(v.items()):
                    f = ET.SubElement(doc, "field", {"name": fk})
                    f.text = "" if fv is None else str(fv)
            else:
                f = ET.SubElement(doc, "field", {"name": k})
                f.text = "" if v is None else str(v)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True), "application/xml"


def _yaml_scalar(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return json.dumps(str(v))  # JSON string quoting is valid YAML


def _render_yaml(payload: dict) -> tuple[bytes, str]:
    lines = [f"count: {payload.get('count', 0)}", "results:"]
    for row in payload.get("results", []):
        first = True
        for k, v in row.items():
            prefix = "- " if first else "  "
            first = False
            if isinstance(v, dict):
                lines.append(f"{prefix}{k}:")
                for fk, fv in sorted(v.items()):
                    lines.append(f"    {fk}: {_yaml_scalar(fv)}")
            else:
                lines.append(f"{prefix}{k}: {_yaml_scalar(v)}")
        if first:  # empty row dict
            lines.append("- {}")
    return ("\n".join(lines) + "\n").encode(), "application/x-yaml"


def _render_html(payload: dict) -> tuple[bytes, str]:
    """Results table — the XSLT ui rendering analogue (ui.html)."""
    rows = payload.get("results", [])
    cols: list[str] = []
    for row in rows:
        for k in row:
            if k not in cols:
                cols.append(k)
    esc = _html.escape
    cells = []
    for row in rows:
        tds = []
        for c in cols:
            v = row.get(c)
            if isinstance(v, dict):
                v = "; ".join(f"{k}={vv}" for k, vv in sorted(v.items()))
            tds.append(f"<td>{esc('' if v is None else str(v))}</td>")
        cells.append("<tr>" + "".join(tds) + "</tr>")
    body = (
        f"<html><body><p>{payload.get('count', 0)} results</p>"
        "<table border='1'><tr>"
        + "".join(f"<th>{esc(c)}</th>" for c in cols)
        + "</tr>"
        + "".join(cells)
        + "</table></body></html>"
    )
    return body.encode(), "text/html"


_RENDERERS = {
    "json": _render_json,
    "xml": _render_xml,
    "yaml": _render_yaml,
    "html": _render_html,
}


def _render_ui(languages: list[str]) -> bytes:
    """The search UI page (ui.html parity): a boolean-query input, one
    authorization checkbox per corpus language (the reference hardcodes
    its wiki languages; here they come from the index metadata), and a
    results iframe fed by /query/html. Plain GET form — the checkbox
    values are folded into one ``auths`` csv parameter client-side,
    exactly like the reference's setAction()."""
    esc = _html.escape
    boxes = "\n".join(
        f"<label>{esc(lang)} <input type='checkbox' name='auth' "
        f"value='{esc(lang)}'></label>"
        for lang in languages
    )
    return f"""<!DOCTYPE html>
<html><head><title>Wiki Search</title></head>
<body>
<h1>Wiki Search</h1>
<p>Boolean query syntax, e.g. <code>TEXT == 'boy' and TITLE =~ 'Aut.*'</code>.
Operators: ==, !=, &lt;, &gt;, &lt;=, &gt;=, =~, !~; grouping with
parentheses; and/or/not. The authorization for a document is its language.</p>
<form method="get" action="/query/html" target="results"
      onsubmit="var cs=this.querySelectorAll('input[name=auth]:checked');
                this.auths.value=Array.from(cs).map(function(c){{return c.value}}).join(',');
                return true;">
  <label>Query: <input type="text" name="query" size="100" maxlength="300"></label>
  <input type="hidden" name="auths" value="">
  <fieldset><legend>Authorizations</legend>
  {boxes}
  </fieldset>
  <input type="submit" value="Submit Query">
</form>
<iframe name="results" width="90%" height="400"></iframe>
</body></html>""".encode()


def _rows(df, limit: int | None):
    if limit:
        df = df.limit(limit)
    return [json.loads(r) for r in df.toJSON().collect()]


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        _langs: list[str] | None = None  # UI auth checkboxes, cached once

        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict, fmt: str = "json"):
            body, ctype = _RENDERERS[fmt](payload)
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            auths = q["auths"].split(",") if q.get("auths") else None
            limit = int(q["limit"]) if q.get("limit") else None
            try:
                if u.path == "/health":
                    return self._send(200, {"status": "ok"})
                if u.path in ("/", "/ui"):
                    langs = Handler._langs
                    if langs is None:
                        langs = Handler._langs = sorted(
                            r["language"]
                            for r in engine.index.metadata.select("language")
                            .distinct()
                            .collect()
                        )
                    body = _render_ui(langs)
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return None
                if u.path == "/query" or u.path.startswith("/query/"):
                    fmt = u.path[len("/query/"):] or "json"
                    if fmt not in _RENDERERS:
                        return self._send(404, {"error": f"no format {fmt}"})
                    df = engine.query(q["query"], auths=auths)
                    if not q.get("ids"):
                        df = engine.fetch_documents(df)
                    rows = _rows(df, limit)
                    return self._send(
                        200, {"results": rows, "count": len(rows)}, fmt
                    )
                if u.path == "/content":
                    rows = _rows(engine.content(q["pointer"], auths=auths), limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/scored":
                    df = engine.scored_search(q["term"], auths=auths).drop("offsets")
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/phrase":
                    df = engine.phrase_search(q["terms"].split(","), auths=auths)
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/bm25":
                    df = engine.scored_search_bm25(q["terms"].split(","), auths=auths)
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/morelike":
                    df = engine.more_like_this(int(q["doc_id"]), auths=auths)
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/explain":
                    return self._send(200, engine.explain_query(q["query"], auths=auths))
                return self._send(404, {"error": f"no route {u.path}"})
            except KeyError as e:
                return self._send(400, {"error": f"missing parameter {e}"})
            except Exception as e:  # noqa: BLE001 — surface as 500, keep serving
                return self._send(500, {"error": str(e)})

    return Handler


def start_server(engine, port: int = 0) -> ThreadingHTTPServer:
    """Start the REST front on ``port`` (0 = ephemeral) in a daemon thread;
    returns the server (``server.server_address[1]`` is the bound port,
    ``server.shutdown()`` stops it)."""
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
