"""End-to-end scored-pipeline tests on the deterministic synthetic corpus
(datagen), including the P/R >= 0.95 triple gate from BASELINE.json and
the top-k entity-neighbor checks (north_star's recast of the reference's
related-files assertions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gossiphs_spark.config import PipelineConfig
from gossiphs_spark.datagen import pages_df
from gossiphs_spark.plans.pipeline import build_graph


@pytest.fixture(autouse=True)
def _unpersist_between_tests(spark):
    """Every build_graph call caches ~6 intermediates; 8 graphs in this
    module once exhausted the shared local-mode heap (OOM on the last
    test after a full-suite run). Uncached frames recompute lazily — at
    60 pages that costs seconds, not correctness."""
    yield
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def graph(spark):
    pages, evidence, expected = pages_df(spark, n_pages=60, seed=7)
    g = build_graph(spark, pages, evidence, PipelineConfig())
    return g, expected


def test_mentions_match_expected_set(graph):
    g, expected = graph
    got = {
        (r["url"], r["name"], r["kind"])
        for r in g.mentions.filter(F.col("kind") != "NAMESPACE").collect()
    }
    exp = set(expected["mentions"])
    # extraction may add REFs for title-cased filler (there are none) —
    # assert exact equality
    missing = exp - got
    extra = got - exp
    assert not missing, f"missing {list(missing)[:5]}"
    assert not extra, f"extra {list(extra)[:5]}"


def test_triples_precision_recall(graph):
    g, expected = graph
    got = {(r["subj"], r["pred"], r["obj"], r["url"]) for r in g.triples.collect()}
    exp = set(expected["triples"])
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_related_pages_nonempty_and_ranked(graph):
    g, _ = graph
    rel = g.related
    assert rel.count() > 0
    # every score positive; no self-links
    assert rel.filter(F.col("score") <= 0).count() == 0
    assert rel.filter(F.col("page") == F.col("other")).count() == 0


def test_def_limit_cap(spark, graph):
    g, _ = graph
    over = (
        g.candidates.groupBy("ref_url", "ref_name")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > PipelineConfig().def_limit)
    )
    assert over.count() == 0


def test_hub_candidates_bounded(graph):
    """Hub entities (on many pages) must not explode candidate counts —
    def_limit keeps per-REF fan-out bounded (the reference's O8 concern)."""
    g, _ = graph
    top = (
        g.candidates.groupBy("def_name")
        .agg(F.countDistinct("ref_url").alias("n_refs"))
        .orderBy(F.desc("n_refs"))
        .first()
    )
    assert top is not None  # pipeline produced candidates at all


def _toy_pages(spark, rows):
    """rows: list of (url, title, body, links). Evidence: one snapshot per
    page (every page passes the per-file gate)."""
    from datetime import datetime, timezone

    ts = datetime(2024, 6, 1, tzinfo=timezone.utc)
    pages, ev = [], []
    for url, title, body, links in rows:
        anchors = "".join(f'<a href="{l}">x</a>' for l in links)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><h1>{title}</h1><p>{body}</p>{anchors}</body></html>"
        )
        pages.append((url, ts, html.encode(), None, "en"))
        ev.append((url, f"snap-{url}", ts))
    pdf = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    edf = spark.createDataFrame(ev, "url string, evidence_id string, ts timestamp")
    return pdf, edf


def test_hub_damping_bounds_candidate_join(spark):
    """O8: a name DEFINED in >max_def_ratio of pages is noise — it must
    produce zero candidate rows (damped IN the join, not pruned after)."""
    rows = []
    for i in range(30):
        url = f"https://h.example/p/{i:02d}.html"
        title = "HotStar" if i % 2 == 0 else f"Rarity{i:02d}"
        body = f"mentions HotStar and Rarity{(i + 1) % 30:02d} here"
        rows.append((url, title, body, []))
    pages, ev = _toy_pages(spark, rows)

    g = build_graph(spark, pages, ev, PipelineConfig(max_def_ratio=0.1))
    assert g.candidates.filter(F.col("def_name") == "HotStar").count() == 0
    # the rare names still link
    assert g.candidates.filter(F.col("def_name").startswith("Rarity")).count() > 0
    # with the knob off (ratio 1.0 -> limit = n_pages) the hub links again
    g2 = build_graph(spark, pages, ev, PipelineConfig(max_def_ratio=1.0))
    assert g2.candidates.filter(F.col("def_name") == "HotStar").count() > 0
    # DEFAULT config is reference parity (1.0 = undamped) on this
    # hub-heavy fixture: identical related output, empty stoplist
    g3 = build_graph(spark, pages, ev, PipelineConfig())
    assert g3.damped.count() == 0
    assert (
        sorted(map(tuple, g3.related.collect()))
        == sorted(map(tuple, g2.related.collect()))
    )


def test_per_file_gate_no_evidence_no_imports(spark):
    """ref graph.rs:608-618: a ref page with neither valid evidence nor an
    explicit import emits no candidate links."""
    rows = [
        ("https://g.example/a.html", "AlphaTitle", "BetaTitle words", []),
        ("https://g.example/b.html", "BetaTitle", "AlphaTitle words", []),
    ]
    pages, ev = _toy_pages(spark, rows)
    # strip page a's evidence: it has no imports either -> gated out
    ev_gated = ev.filter(F.col("url") != "https://g.example/a.html")
    g = build_graph(spark, pages, ev_gated, PipelineConfig())
    assert g.candidates.filter(
        F.col("ref_url") == "https://g.example/a.html"
    ).count() == 0
    assert g.candidates.filter(
        F.col("ref_url") == "https://g.example/b.html"
    ).count() > 0


def test_w4_file_max_links_caps_related(spark):
    pages, evidence, _ = pages_df(spark, n_pages=40, seed=7)
    cfg = PipelineConfig(file_max_links=2)
    g = build_graph(spark, pages, evidence, cfg)
    over = (
        g.related.groupBy("page").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 2)
    )
    assert over.count() == 0
    assert g.related.count() > 0


def test_deterministic_across_runs(spark):
    pages, evidence, _ = pages_df(spark, n_pages=30, seed=11)
    cfg = PipelineConfig()
    r1 = build_graph(spark, pages, evidence, cfg).related.collect()
    r2 = build_graph(spark, pages.repartition(7), evidence.repartition(3), cfg).related.collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
