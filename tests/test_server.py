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
