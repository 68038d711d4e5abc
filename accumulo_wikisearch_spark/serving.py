"""Minimal REST serving front — endpoint parity with the reference's web
service (query-war/src/main/webapp/WEB-INF/web.xml:33-40):

    GET /query?query=<jexl>&auths=en,fr[&limit=N][&ids=1]   (≈ /Query/json)
    GET /content?pointer=DOCUMENT:partition/lang/id          (≈ /Content)
    GET /scored?term=<term>[&limit=N]
    GET /health

Responses are JSON: {"results": [...], "count": N}. Stdlib ``http.server``
only — serving is I/O-light (Spark does the work); a production deployment
would front the same engine object with any ASGI server. The engine and its
SparkSession are thread-safe for concurrent read queries (independent jobs
against the shared cached catalog — the BatchScanner-pool analogue)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _rows(df, limit: int | None):
    if limit:
        df = df.limit(limit)
    return [json.loads(r) for r in df.toJSON().collect()]


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
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
                if u.path == "/query":
                    df = engine.query(q["query"], auths=auths)
                    if not q.get("ids"):
                        df = engine.fetch_documents(df)
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/content":
                    rows = _rows(engine.content(q["pointer"], auths=auths), limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
                if u.path == "/scored":
                    df = engine.scored_search(q["term"], auths=auths).drop("offsets")
                    rows = _rows(df, limit)
                    return self._send(200, {"results": rows, "count": len(rows)})
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
