"""S8 HTTP server over the materialized related table: build with Spark,
serve with DuckDB — request/response behavior end to end over real HTTP."""

from __future__ import annotations

import json
import urllib.request


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def test_server_relate_over_materialized_table(spark, tmp_path):
    from gossiphs_spark.server import RelatedServer

    rel = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 7), ("a", "d", 7), ("b", "a", 1)],
        "page string, other string, score long",
    )
    out = str(tmp_path / "rel")
    rel.write.parquet(out)

    srv = RelatedServer(f"{out}/*.parquet").start()
    try:
        code, health = _get(srv.port, "/health")
        assert code == 200 and health == {"status": "ok", "rows": 4}

        code, rows = _get(srv.port, "/relate?url=a&top=2")
        assert code == 200
        # score desc, name tie-break — deterministic top-k
        assert [(r["other"], r["score"]) for r in rows] == [("c", 7), ("d", 7)]

        code, rows = _get(srv.port, "/relate?url=zzz")
        assert code == 200 and rows == []

        for bad in ("/relate", "/relate?url=a&top=abc", "/relate?url=a&top=-1"):
            try:
                _get(srv.port, bad)
                assert False, f"{bad} must 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_server_stop_before_start_does_not_hang(spark, tmp_path):
    from gossiphs_spark.server import RelatedServer

    rel = spark.createDataFrame([("a", "b", 1)], "page string, other string, score long")
    out = str(tmp_path / "rel2")
    rel.write.parquet(out)
    srv = RelatedServer(f"{out}/*.parquet")
    srv.stop()  # never started — must return, not deadlock


def test_server_symbol_and_metadata_routes(spark, tmp_path):
    """S8 parity increment (ref src/server.rs:104-164): /symbol/relation
    serves the symbol-level edge slice, /file/metadata the page's
    metadata row — both over exported parquet, no JVM at serve time."""
    import urllib.error

    from gossiphs_spark.server import RelatedServer

    rel = spark.createDataFrame(
        [("a", "b", 3)], "page string, other string, score long"
    )
    edges = spark.createDataFrame(
        [("a", "b", "Alpha", 5), ("c", "b", "Alpha", 9), ("a", "d", "Beta", 2)],
        "src_url string, dst_url string, name string, weight long",
    )
    meta = spark.createDataFrame(
        [("a", 2, 7), ("b", 1, 0)], "url string, n_defs long, n_refs long"
    )
    rel_dir, e_dir, m_dir = (str(tmp_path / d) for d in ("rel", "edges", "meta"))
    rel.write.parquet(rel_dir)
    edges.write.parquet(e_dir)
    meta.write.parquet(m_dir)

    srv = RelatedServer(
        f"{rel_dir}/*.parquet", edges_glob=f"{e_dir}/*.parquet",
        metadata_glob=f"{m_dir}/*.parquet",
    ).start()
    try:
        code, rows = _get(srv.port, "/symbol/relation?name=Alpha")
        assert code == 200
        assert [(r["src_url"], r["weight"]) for r in rows] == [("c", 9), ("a", 5)]
        code, rows = _get(srv.port, "/symbol/relation?name=Alpha&top=1")
        assert [(r["src_url"], r["weight"]) for r in rows] == [("c", 9)]
        code, rows = _get(srv.port, "/symbol/relation?name=Nope")
        assert code == 200 and rows == []

        code, row = _get(srv.port, "/file/metadata?url=a")
        assert code == 200 and row == {"url": "a", "n_defs": 2, "n_refs": 7}
        for bad, want in (
            ("/file/metadata?url=zzz", 404),
            ("/file/metadata", 400),
            ("/symbol/relation", 400),
            ("/symbol/relation?name=A&top=x", 400),
        ):
            try:
                _get(srv.port, bad)
                assert False, f"{bad} must {want}"
            except urllib.error.HTTPError as e:
                assert e.code == want
    finally:
        srv.stop()

    # routes without their table answer 503, and /relate still works
    srv2 = RelatedServer(f"{rel_dir}/*.parquet").start()
    try:
        for path in ("/symbol/relation?name=A", "/file/metadata?url=a"):
            try:
                _get(srv2.port, path)
                assert False, f"{path} must 503"
            except urllib.error.HTTPError as e:
                assert e.code == 503
        code, rows = _get(srv2.port, "/relate?url=a")
        assert code == 200 and rows
    finally:
        srv2.stop()


def test_server_metadata_serializes_nonjson_types(spark, tmp_path):
    """Regression: metadata rows with timestamp/date columns must come
    back as JSON (stringified), not a dropped connection."""
    from datetime import datetime, timezone

    from gossiphs_spark.server import RelatedServer

    rel = spark.createDataFrame([("a", "b", 1)], "page string, other string, score long")
    meta = spark.createDataFrame(
        [("a", datetime(2024, 6, 1, tzinfo=timezone.utc), 3)],
        "url string, warc_ts timestamp, n_defs long",
    )
    rel_dir, m_dir = str(tmp_path / "rel"), str(tmp_path / "meta")
    rel.write.parquet(rel_dir)
    meta.write.parquet(m_dir)
    srv = RelatedServer(f"{rel_dir}/*.parquet", metadata_glob=f"{m_dir}/*.parquet").start()
    try:
        code, row = _get(srv.port, "/file/metadata?url=a")
        assert code == 200
        assert row["url"] == "a" and row["n_defs"] == 3
        assert row["warc_ts"].startswith("2024-06-01")
    finally:
        srv.stop()


def test_multigraph_server_lru(spark, tmp_path):
    """MCP file_impact analog (ref mcp/gossiphs_mcp/tools.py:5-48): many
    graphs behind one server, LRU-bounded open handles, eviction reopens
    transparently."""
    import urllib.error

    from gossiphs_spark.server import MultiGraphServer

    for gname, score in (("ga", 11), ("gb", 22), ("gc", 33)):
        rel = spark.createDataFrame(
            [(f"{gname}-page", "x", score)], "page string, other string, score long"
        )
        rel.write.parquet(str(tmp_path / gname / "related"))

    srv = MultiGraphServer(str(tmp_path), max_graphs=2).start()
    try:
        code, listing = _get(srv.port, "/graphs")
        assert code == 200
        assert listing == {"graphs": ["ga", "gb", "gc"], "loaded": []}

        for gname, score in (("ga", 11), ("gb", 22), ("gc", 33)):
            code, rows = _get(srv.port, f"/relate?url={gname}-page&graph={gname}")
            assert code == 200 and rows[0]["score"] == score

        # max_graphs=2: ga was least recently used → evicted
        code, listing = _get(srv.port, "/graphs")
        assert listing["loaded"] == ["gb", "gc"]
        # evicted graph transparently reopens (and evicts gb)
        code, rows = _get(srv.port, "/relate?url=ga-page&graph=ga")
        assert code == 200 and rows[0]["score"] == 11
        code, listing = _get(srv.port, "/graphs")
        assert listing["loaded"] == ["gc", "ga"]

        # symbol route without an edges table answers 503 per graph
        try:
            _get(srv.port, "/symbol/relation?name=x&graph=ga")
            assert False, "must 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        for bad, want in (
            ("/relate?url=x", 400),                 # missing graph
            ("/relate?url=x&graph=nope", 404),      # unknown graph
            ("/relate?url=x&graph=..", 404),        # traversal rejected
        ):
            try:
                _get(srv.port, bad)
                assert False, f"{bad} must {want}"
            except urllib.error.HTTPError as e:
                assert e.code == want
    finally:
        srv.stop()


def test_multigraph_eviction_race_hammer(spark, tmp_path):
    """ADVICE r4 (medium): LRU eviction must never close a DuckDB handle
    while another request is executing on it. With max_graphs=1, every
    alternating request evicts the other graph's handle — N threads
    hammering two graphs force constant evict-while-in-flight pressure.
    Handles are pinned (refcounted) by open_graph, so every request must
    come back 200 with the right rows; a closed-handle query would 500 /
    drop the connection (or crash the process outright)."""
    import threading

    from gossiphs_spark.server import MultiGraphServer

    for gname, score in (("ga", 11), ("gb", 22)):
        rel = spark.createDataFrame(
            [(f"{gname}-page", "x", score)], "page string, other string, score long"
        )
        rel.write.parquet(str(tmp_path / gname / "related"))

    srv = MultiGraphServer(str(tmp_path), max_graphs=1).start()
    errors: list[str] = []

    import time

    deadline = time.monotonic() + 5.0  # r5 verdict item 7: ~5 s of fire
    n_reqs = [0] * 8

    def hammer(tid: int) -> None:
        i = 0
        while time.monotonic() < deadline or i < 25:
            gname, score = ("ga", 11) if (tid + i) % 2 == 0 else ("gb", 22)
            try:
                code, rows = _get(srv.port, f"/relate?url={gname}-page&graph={gname}")
                if code != 200 or rows[0]["score"] != score:
                    errors.append(f"t{tid} i{i}: code={code} rows={rows}")
            except Exception as e:  # dropped connection / HTTP error
                errors.append(f"t{tid} i{i}: {type(e).__name__}: {e}")
            i += 1
        n_reqs[tid] = i

    try:
        threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, (len(errors), errors[:5])
        assert sum(n_reqs) >= 200, n_reqs  # the fire was real
        # every pin was dropped: the surviving handle is idle and alive
        with srv._lock:
            assert all(g.refs == 0 and not g.defunct for g in srv._lru.values())
            assert len(srv._lru) == 1
    finally:
        srv.stop()


def test_multigraph_defunct_reopen_under_fire(spark, tmp_path):
    """r5 verdict item 7: a handle evicted WHILE PINNED goes defunct
    (off-catalog, closes at last unpin) — and the same graph must
    transparently reopen as a FRESH handle for new requests while the old
    pin is still held. The held pin stands in for a slow in-flight query
    spanning the whole reopen burst."""
    import threading

    from gossiphs_spark.server import MultiGraphServer

    for gname, score in (("ga", 11), ("gb", 22)):
        rel = spark.createDataFrame(
            [(f"{gname}-page", "x", score)], "page string, other string, score long"
        )
        rel.write.parquet(str(tmp_path / gname / "related"))

    srv = MultiGraphServer(str(tmp_path), max_graphs=1).start()
    try:
        old = srv._open_graph("ga")  # held pin: simulated in-flight query
        assert old is not None and old.refs == 1
        code, _ = _get(srv.port, "/relate?url=gb-page&graph=gb")
        assert code == 200  # loading gb evicts pinned ga → defunct
        assert old.defunct and old.refs == 1
        with old.lock:
            old.con.execute("SELECT 1")  # still open: our pin holds it

        errors: list[str] = []

        def fire(tid: int) -> None:
            for i in range(20):
                try:
                    code, rows = _get(srv.port, "/relate?url=ga-page&graph=ga")
                    if code != 200 or rows[0]["score"] != 11:
                        errors.append(f"t{tid} i{i}: {code} {rows}")
                except Exception as e:
                    errors.append(f"t{tid} i{i}: {type(e).__name__}: {e}")

        threads = [threading.Thread(target=fire, args=(t,)) for t in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors[:5]
        # the reopened catalog entry is a NEW handle; the defunct one is
        # still open solely because our pin holds it
        with srv._lock:
            assert srv._lru["ga"] is not old
        with old.lock:
            old.con.execute("SELECT 1")
        srv._unpin(old)  # last unpin closes the defunct handle…
        import duckdb
        try:
            with old.lock:
                old.con.execute("SELECT 1")
            assert False, "defunct handle still open after last unpin"
        except duckdb.Error:
            pass
        # …without disturbing the live one
        code, rows = _get(srv.port, "/relate?url=ga-page&graph=ga")
        assert code == 200 and rows[0]["score"] == 11
    finally:
        srv.stop()
