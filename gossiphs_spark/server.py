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
``MultiGraphServer`` serves many graphs from one process behind an LRU
of open handles (the reference's MCP file_impact analog). Everything
here is read-only; the tables are immutable once written (lineage/commit
semantics live in the build path, lineage.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import duckdb


class GraphHandle:
    """One materialized graph: a DuckDB connection with related (and
    optionally edges / metadata) views. No sockets — serving composes
    handles; the MultiGraphServer LRU stores them directly."""

    def __init__(self, parquet_glob: str, edges_glob: str | None = None,
                 metadata_glob: str | None = None):
        self.con = duckdb.connect()
        # CREATE VIEW cannot be a prepared statement — escape the path
        safe = parquet_glob.replace("'", "''")
        self.con.execute(
            f"CREATE VIEW related AS SELECT * FROM read_parquet('{safe}')"
        )
        # optional symbol-level tables (edges: src_url,dst_url,name,weight;
        # metadata: url + whatever the export carried) — routes that need
        # an unprovided table answer 503, not 500
        self.have_edges = edges_glob is not None
        if self.have_edges:
            safe_e = edges_glob.replace("'", "''")
            self.con.execute(
                f"CREATE VIEW edges AS SELECT * FROM read_parquet('{safe_e}')"
            )
        self.have_meta = metadata_glob is not None
        if self.have_meta:
            safe_m = metadata_glob.replace("'", "''")
            self.con.execute(
                f"CREATE VIEW metadata AS SELECT * FROM read_parquet('{safe_m}')"
            )
        self.lock = threading.Lock()  # duckdb connections are not MT-safe
        # MultiGraphServer pin-counting (guarded by ITS catalog lock, not
        # self.lock): an evicted handle defers close until the last
        # in-flight request unpins it
        self.refs = 0
        self.defunct = False

    def close(self) -> None:
        # taken under self.lock: closing a DuckDB connection while another
        # thread executes on it can crash the whole process — an in-flight
        # query (if any slipped past the refcount, e.g. RelatedServer.stop
        # racing a daemon handler thread) finishes first
        with self.lock:
            self.con.close()


def _qparam(query: dict, name: str) -> str | None:
    return (query.get(name) or [None])[0]


def _qtop(query: dict, default: str):
    """Parse &top=: non-negative int, clamped below int64 (a LIMIT past
    int64 errors inside DuckDB's binder, dropping the connection).
    Returns (top, None) or (None, error)."""
    try:
        top = int((query.get("top") or [default])[0])
        if top < 0:
            raise ValueError
        return min(top, 1_000_000), None
    except ValueError:
        return None, "top must be a non-negative integer"


def route_graph(g: GraphHandle, path: str, q: dict):
    """The four query routes over one graph handle → (status, payload).
    Shared by the single-graph and multi-graph servers."""
    if path == "/health":
        with g.lock:
            n = g.con.execute("SELECT COUNT(*) FROM related").fetchone()[0]
        return 200, {"status": "ok", "rows": n}
    if path == "/relate":
        url = _qparam(q, "url")
        if not url:
            return 400, {"error": "missing url param"}
        top, err = _qtop(q, "10")
        if err:
            return 400, {"error": err}
        with g.lock:
            rows = g.con.execute(
                "SELECT page, other, score FROM related "
                "WHERE page = ? ORDER BY score DESC, other LIMIT ?",
                [url, top],
            ).fetchall()
        return 200, [
            {"page": p, "other": o, "score": s} for p, o, s in rows
        ]
    if path == "/symbol/relation":
        # ref src/server.rs:104-131: a symbol's edge slice, both
        # directions (defining page ← referencing pages)
        if not g.have_edges:
            return 503, {"error": "no edges table configured"}
        name = _qparam(q, "name")
        if not name:
            return 400, {"error": "missing name param"}
        top, err = _qtop(q, "100")
        if err:
            return 400, {"error": err}
        with g.lock:
            rows = g.con.execute(
                "SELECT src_url, dst_url, name, weight FROM edges "
                "WHERE name = ? ORDER BY weight DESC, src_url, dst_url "
                "LIMIT ?", [name, top],
            ).fetchall()
        return 200, [
            {"src_url": s, "dst_url": d, "name": n, "weight": w}
            for s, d, n, w in rows
        ]
    if path == "/file/metadata":
        # ref src/server.rs:133-164: the page's metadata row
        if not g.have_meta:
            return 503, {"error": "no metadata table configured"}
        url = _qparam(q, "url")
        if not url:
            return 400, {"error": "missing url param"}
        with g.lock:
            cur = g.con.execute(
                "SELECT * FROM metadata WHERE url = ? LIMIT 1", [url]
            )
            cols = [d[0] for d in cur.description]
            row = cur.fetchone()
        if row is None:
            return 404, {"error": "unknown url"}
        return 200, dict(zip(cols, row))
    return 404, {"error": "unknown path"}


class _JsonHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet test runs
        pass

    def _reply(self, code: int, payload) -> None:
        # default=str: parquet metadata rows can carry timestamps, dates,
        # decimals or blobs — a TypeError here would escape do_GET and
        # drop the connection with no HTTP response
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class _HttpFront:
    """Shared start/stop plumbing for both servers."""

    _httpd: ThreadingHTTPServer
    port: int
    _thread: threading.Thread | None

    def start(self):
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


class RelatedServer(_HttpFront):
    """Serve one related-pages parquet directory (page, other, score)."""

    def __init__(self, parquet_glob: str, host: str = "127.0.0.1",
                 port: int = 0, edges_glob: str | None = None,
                 metadata_glob: str | None = None):
        graph = GraphHandle(parquet_glob, edges_glob, metadata_glob)
        self._graph = graph

        class Handler(_JsonHandler):
            def do_GET(self):
                u = urlparse(self.path)
                self._reply(*route_graph(graph, u.path, parse_qs(u.query)))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = None

    def stop(self) -> None:
        super().stop()
        self._graph.close()


class MultiGraphServer(_HttpFront):
    """Serve MANY materialized graphs from one process with an LRU of
    open handles — the analog of the reference's MCP ``file_impact``
    tools, which keep an LRU cache of loaded graphs keyed by repo path
    (/root/reference/mcp/gossiphs_mcp/tools.py:5-48).

    ``root_dir`` holds one subdirectory per graph, each with a
    ``related/`` parquet dir (plus optional ``edges/`` / ``metadata/``).
    Every query route takes ``&graph=<name>``; ``GET /graphs`` lists the
    available and currently-loaded graphs. At most ``max_graphs`` DuckDB
    handles stay open — the least-recently-used closes on overflow, and a
    re-request reopens it (the tables are immutable parquet, so eviction
    loses nothing but warmth)."""

    def __init__(self, root_dir: str, host: str = "127.0.0.1", port: int = 0,
                 max_graphs: int = 4):
        import os
        from collections import OrderedDict

        self._root = root_dir
        self._max = max(1, max_graphs)
        self._lru: "OrderedDict[str, GraphHandle]" = OrderedDict()
        self._lock = threading.Lock()
        self._stopping = False
        outer = self

        def open_graph(name: str) -> GraphHandle | None:
            """Returns a PINNED handle (refs incremented under the catalog
            lock) — the caller MUST unpin() it. Pinning closes the
            eviction race: an insert that evicts this handle defers the
            DuckDB close until the last in-flight request drops its pin,
            so no query ever runs on a closing connection."""
            base = os.path.join(outer._root, name)
            if (
                os.sep in name or name in ("", ".", "..")
                or not os.path.isdir(os.path.join(base, "related"))
            ):
                return None
            with outer._lock:
                if name in outer._lru:
                    outer._lru.move_to_end(name)
                    g = outer._lru[name]
                    g.refs += 1
                    return g
            # construct outside the catalog lock (view creation reads
            # parquet footers); only one instance wins the insert race
            edges = os.path.join(base, "edges")
            meta = os.path.join(base, "metadata")
            built = GraphHandle(
                os.path.join(base, "related", "*.parquet"),
                edges_glob=os.path.join(edges, "*.parquet")
                if os.path.isdir(edges) else None,
                metadata_glob=os.path.join(meta, "*.parquet")
                if os.path.isdir(meta) else None,
            )
            evicted = None
            with outer._lock:
                if outer._stopping:
                    # stop() already drained the catalog — inserting now
                    # would leak an open handle nothing ever closes. Serve
                    # this one request off-catalog and close at unpin.
                    built.defunct = True
                    built.refs += 1
                    return built
                if name in outer._lru:  # lost the race — keep the winner
                    evicted = built  # never exposed: close below, unpinned
                else:
                    outer._lru[name] = built
                    if len(outer._lru) > outer._max:
                        _, dropped = outer._lru.popitem(last=False)
                        dropped.defunct = True
                        if dropped.refs == 0:
                            evicted = dropped  # idle — close now (below)
                        # else: last unpin() closes it
                outer._lru.move_to_end(name)
                g = outer._lru[name]
                g.refs += 1
            if evicted is not None:
                evicted.close()  # outside the catalog lock — close waits
                # on the handle's own lock, never blocks other routes
            return g

        def unpin(g: GraphHandle) -> None:
            with outer._lock:
                g.refs -= 1
                close_now = g.defunct and g.refs == 0
            if close_now:
                g.close()

        class Handler(_JsonHandler):
            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/graphs":
                    try:
                        names = sorted(
                            d for d in os.listdir(outer._root)
                            if os.path.isdir(
                                os.path.join(outer._root, d, "related")
                            )
                        )
                    except OSError as e:
                        # missing/unreadable root must be an HTTP error,
                        # not a dropped connection
                        return self._reply(
                            500, {"error": f"graph root unreadable: {e}"}
                        )
                    with outer._lock:
                        loaded = list(outer._lru)
                    return self._reply(200, {"graphs": names, "loaded": loaded})
                q = parse_qs(u.query)
                gname = _qparam(q, "graph")
                if not gname:
                    return self._reply(400, {"error": "missing graph param"})
                g = open_graph(gname)
                if g is None:
                    return self._reply(404, {"error": f"unknown graph {gname!r}"})
                try:
                    return self._reply(*route_graph(g, u.path, q))
                finally:
                    unpin(g)

        # exposed for the pin/evict stress tests (tests/test_server.py) —
        # the HTTP handler itself only ever uses the closures above
        self._open_graph = open_graph
        self._unpin = unpin
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = None

    def stop(self) -> None:
        super().stop()
        with self._lock:
            self._stopping = True
            handles = list(self._lru.values())
            self._lru.clear()
            idle = []
            for g in handles:
                g.defunct = True
                if g.refs == 0:
                    idle.append(g)
        for g in idle:
            g.close()
        # pinned handles (daemon handler threads mid-query) close at their
        # last unpin()


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
