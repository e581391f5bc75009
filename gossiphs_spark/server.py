"""S8 — HTTP query server over the MATERIALIZED related table
(ref src/server.rs: ``gossiphs server`` answers /file/relate over the
in-memory graph).

Spark is a batch engine, not a serving tier; the production shape is
build-with-Spark → serve-from-the-materialized-table. This server is
that shape in miniature: a stdlib ThreadingHTTPServer answering

    GET /relate?url=<page>&top=<k>       → JSON rows (page, other, score)
    GET /symbol/relation?name=<s>&top=<k>→ symbol-level edge rows
                                           (ref src/server.rs:104-131)
    GET /file/metadata?url=<page>        → the page's metadata row
                                           (ref src/server.rs:133-164)
    GET /health                          → {"status": "ok", "rows": N}

over the parquet the pipeline wrote (cli `relate`/`export` output; the
symbol routes need the edge / metadata tables passed at construction),
queried through DuckDB — no Spark session, no JVM, millisecond startup.
Everything here is read-only; the tables are immutable once written
(lineage/commit semantics live in the build path, lineage.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import duckdb


class RelatedServer:
    """Serve a related-pages parquet directory (page, other, score)."""

    def __init__(self, parquet_glob: str, host: str = "127.0.0.1",
                 port: int = 0, edges_glob: str | None = None,
                 metadata_glob: str | None = None):
        self._con = duckdb.connect()
        # CREATE VIEW cannot be a prepared statement — escape the path
        safe = parquet_glob.replace("'", "''")
        self._con.execute(
            f"CREATE VIEW related AS SELECT * FROM read_parquet('{safe}')"
        )
        # optional symbol-level tables (edges: src_url,dst_url,name,weight;
        # metadata: url + whatever the export carried) — routes that need
        # an unprovided table answer 503, not 500
        self._have_edges = edges_glob is not None
        if self._have_edges:
            safe_e = edges_glob.replace("'", "''")
            self._con.execute(
                f"CREATE VIEW edges AS SELECT * FROM read_parquet('{safe_e}')"
            )
        self._have_meta = metadata_glob is not None
        if self._have_meta:
            safe_m = metadata_glob.replace("'", "''")
            self._con.execute(
                f"CREATE VIEW metadata AS SELECT * FROM read_parquet('{safe_m}')"
            )
        self._lock = threading.Lock()  # duckdb connections are not MT-safe
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _reply(self, code: int, payload) -> None:
                # default=str: parquet metadata rows can carry timestamps,
                # dates, decimals or blobs — a TypeError here would escape
                # do_GET and drop the connection with no HTTP response
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _qparam(self, query: dict, name: str) -> str | None:
                return (query.get(name) or [None])[0]

            def _qtop(self, query: dict, default: str):
                """Parse &top=: non-negative int, clamped below int64 (a
                LIMIT past int64 errors inside DuckDB's binder, dropping
                the connection). Returns (top, None) or (None, error)."""
                try:
                    top = int((query.get("top") or [default])[0])
                    if top < 0:
                        raise ValueError
                    return min(top, 1_000_000), None
                except ValueError:
                    return None, "top must be a non-negative integer"

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/health":
                    with outer._lock:
                        n = outer._con.execute(
                            "SELECT COUNT(*) FROM related").fetchone()[0]
                    return self._reply(200, {"status": "ok", "rows": n})
                if u.path == "/relate":
                    q = parse_qs(u.query)
                    url = self._qparam(q, "url")
                    if not url:
                        return self._reply(400, {"error": "missing url param"})
                    top, err = self._qtop(q, "10")
                    if err:
                        return self._reply(400, {"error": err})
                    with outer._lock:
                        rows = outer._con.execute(
                            "SELECT page, other, score FROM related "
                            "WHERE page = ? ORDER BY score DESC, other "
                            "LIMIT ?", [url, top],
                        ).fetchall()
                    return self._reply(200, [
                        {"page": p, "other": o, "score": s} for p, o, s in rows
                    ])
                if u.path == "/symbol/relation":
                    # ref src/server.rs:104-131: a symbol's edge slice,
                    # both directions (defining page ← referencing pages)
                    if not outer._have_edges:
                        return self._reply(
                            503, {"error": "no edges table configured"}
                        )
                    q = parse_qs(u.query)
                    name = self._qparam(q, "name")
                    if not name:
                        return self._reply(400, {"error": "missing name param"})
                    top, err = self._qtop(q, "100")
                    if err:
                        return self._reply(400, {"error": err})
                    with outer._lock:
                        rows = outer._con.execute(
                            "SELECT src_url, dst_url, name, weight FROM edges "
                            "WHERE name = ? "
                            "ORDER BY weight DESC, src_url, dst_url LIMIT ?",
                            [name, top],
                        ).fetchall()
                    return self._reply(200, [
                        {"src_url": s, "dst_url": d, "name": n, "weight": w}
                        for s, d, n, w in rows
                    ])
                if u.path == "/file/metadata":
                    # ref src/server.rs:133-164: the page's metadata row
                    if not outer._have_meta:
                        return self._reply(
                            503, {"error": "no metadata table configured"}
                        )
                    q = parse_qs(u.query)
                    url = self._qparam(q, "url")
                    if not url:
                        return self._reply(400, {"error": "missing url param"})
                    with outer._lock:
                        cur = outer._con.execute(
                            "SELECT * FROM metadata WHERE url = ? LIMIT 1", [url]
                        )
                        cols = [d[0] for d in cur.description]
                        row = cur.fetchone()
                    if row is None:
                        return self._reply(404, {"error": "unknown url"})
                    return self._reply(200, dict(zip(cols, row)))
                return self._reply(404, {"error": "unknown path"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "RelatedServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is not None:
            # shutdown() blocks on serve_forever's shut-down event, which
            # never fires for a server that was never started — guard it
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def serve(parquet_glob: str, host: str = "127.0.0.1", port: int = 8421):
    """Blocking entry point: ``python -m gossiphs_spark.server <glob>``."""
    s = RelatedServer(parquet_glob, host, port)
    print(json.dumps({"serving": parquet_glob, "port": s.port}))
    try:
        s._httpd.serve_forever()
    except KeyboardInterrupt:
        s.stop()


if __name__ == "__main__":
    import sys

    serve(sys.argv[1], *(sys.argv[2:3] or ["127.0.0.1"]))
