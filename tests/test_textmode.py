"""Unit tests for the text-mode KG stages (mock-DataFrame fixtures,
recasting the reference's in-memory graph tests).

* related-pages rollup scores recast test_related_files_logic
  (/root/reference/src/api.rs:457-526): B=5, C=4 incoming; outgoing raw 10.
* pointless-symbol semi-join filter recasts test_internal_symbol_filtering
  (/root/reference/src/graph.rs:1118-1160).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gossiphs_spark.operators import textmode as tm


@pytest.mark.smoke
def test_mentions_offsets_and_kinds(spark):
    pages = spark.createDataFrame(
        [("p1", "alpha beta alpha", "s1")], "url string, content string, source string"
    )
    rows = {(r["name"], r["pos"]): r for r in tm.mentions(pages).collect()}
    assert rows[("alpha", 0)]["kind"] == "DEF"
    assert rows[("alpha", 0)]["start_byte"] == 0
    assert rows[("alpha", 0)]["end_byte"] == 5
    assert rows[("beta", 1)]["kind"] == "DEF"
    assert rows[("beta", 1)]["start_byte"] == 6
    assert rows[("alpha", 2)]["kind"] == "REF"
    assert rows[("alpha", 2)]["start_byte"] == 11


def test_pointless_filter_semijoins(spark):
    # recasts graph.rs:1118-1160: DEF without REF dropped, REF without DEF
    # dropped, matched pair kept; short names dropped first (F6)
    m = spark.createDataFrame(
        [
            ("a", "matched", "DEF", 0, 0, 7),
            ("b", "matched", "REF", 0, 0, 7),
            ("a", "lonelydef", "DEF", 1, 10, 19),
            ("b", "lonelyref", "REF", 1, 10, 19),
            ("a", "abc", "DEF", 2, 20, 23),  # len 3 <= limit → dropped
        ],
        "url string, name string, kind string, pos long, start_byte long, end_byte long",
    )
    kept = tm.filter_pointless(m, symbol_len_limit=3)
    got = {(r["url"], r["name"], r["kind"]) for r in kept.collect()}
    assert got == {("a", "matched", "DEF"), ("b", "matched", "REF")}


def test_related_pages_scores(spark):
    # recasts api.rs:457-526 with page A defining foo+bar, B ref foo w=10,
    # C ref foo w=5 and bar w=5 → incoming to A: B=10//2=5, C=2+2=4;
    # outgoing from B: A=10.
    edges = spark.createDataFrame(
        [("b", "a", "foo", 10), ("c", "a", "foo", 5), ("c", "a", "bar", 5)],
        "src_url string, dst_url string, name string, weight long",
    )
    defs = spark.createDataFrame(
        [("a", "foo", "DEF"), ("a", "bar", "DEF")], "url string, name string, kind string"
    )
    rel = tm.related_pages(edges, defs)
    scores = {(r["page"], r["other"]): r["score"] for r in rel.collect()}
    assert scores[("a", "b")] == 5
    assert scores[("a", "c")] == 4
    assert scores[("b", "a")] == 10
    assert scores[("c", "a")] == 10  # outgoing from C: 5 + 5


def test_idf_formula(spark):
    defs = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y")], "url string, name string"
    )
    out = {r["name"]: r for r in tm.idf(defs, total_pages=4).collect()}
    import math

    assert out["x"]["df"] == 2
    assert abs(out["x"]["idf"] - (math.log(4 / 2) + 1.0)) < 1e-12
    assert abs(out["y"]["idf"] - (math.log(4 / 1) + 1.0)) < 1e-12


def test_unique_def_fallback(spark):
    defs = spark.createDataFrame(
        [("a", "solo"), ("a", "linked"), ("b", "dup"), ("c", "dup")],
        "url string, name string",
    )
    refs = spark.createDataFrame(
        [("x", "solo"), ("y", "solo"), ("x", "dup"), ("x", "linked")],
        "url string, name string",
    )
    linked = spark.createDataFrame([("linked",)], "name string")
    out = tm.unique_def_fallback(defs, refs, linked)
    got = {(r["name"], r["def_url"], r["ref_url"]) for r in out.collect()}
    # 'dup' defined twice → not unique; 'linked' already linked; 'solo' links both refs
    assert got == {("solo", "a", "x"), ("solo", "a", "y")}


@pytest.mark.smoke
def test_related_with_symbols_explains_score(spark):
    """The nested rollup (ref api.rs:108-126): per related pair, the
    symbol list's weights must sum to exactly the pair's score, and the
    pair scores must equal the flat related_pages output."""
    pages = spark.createDataFrame(
        [
            ("a", "alpha gamma alpha gamma beta1", "s"),
            ("b", "alpha beta1 alpha", "s"),
            ("c", "gamma gamma beta1", "s"),
        ],
        "url string, content string, source string",
    )
    m = tm.filter_pointless(tm.mentions(pages), 3)
    defs = m.filter(F.col("kind") == "DEF")
    refs = m.filter(F.col("kind") == "REF")
    e = tm.edges(defs, refs)
    nested = tm.related_with_symbols(e, defs, refs)
    flat = {(r["page"], r["other"]): r["score"]
            for r in tm.related_pages(e, defs).collect()}
    rows = nested.collect()
    assert rows
    for r in rows:
        assert sum(s["w"] for s in r["symbols"]) == r["score"]
        assert flat[(r["page"], r["other"])] == r["score"]
        names = [s["name"] for s in r["symbols"]]
        assert names == sorted(names)


def test_symbol_neighbors_slices_edges(spark):
    pages = spark.createDataFrame(
        [("a", "alpha beta1 alpha", "s"), ("b", "alpha gamma", "s")],
        "url string, content string, source string",
    )
    m = tm.filter_pointless(tm.mentions(pages), 3)
    e = tm.edges(m.filter(F.col("kind") == "DEF"), m.filter(F.col("kind") == "REF"))
    out = tm.symbol_neighbors(e, "alpha", kind="DEF").collect()
    assert all(r["name"] == "alpha" for r in out)


def test_edge_names_matches_edge_join_key_set(spark):
    """edge_names must equal edges().select('name').distinct() including
    the boundary the dense corpora never hit: a name whose only def and
    only ref share ONE page has no edge (src != dst empties it) and must
    be excluded; a single-def name ref'd from another page stays."""
    from pyspark.sql import functions as F

    from gossiphs_spark.operators import textmode as tm

    pages = spark.createDataFrame(
        [
            # "solo" def+ref only on p1 -> no edge
            ("doc://1", "solo thing solo", "s"),
            # "thing" defined on p1 and p2, ref'd on p2 (second
            # occurrence) -> edge p2 -> p1
            ("doc://2", "other thing thing", "s"),
            # "other" defined on p2, never ref'd elsewhere -> no edge
            # "only_def" defined p3, no refs anywhere -> no edge
            ("doc://3", "only_def word word", "s"),
        ],
        "url string, content string, source string",
    )
    fm = tm.filter_pointless(tm.mentions(pages), 3)
    defs = fm.filter(F.col("kind") == "DEF")
    refs = fm.filter(F.col("kind") == "REF")
    expected = sorted(
        r["name"] for r in tm.edges(defs, refs).select("name").distinct().collect()
    )
    got = sorted(r["name"] for r in tm.edge_names(defs, refs).collect())
    assert got == expected
    assert "thing" in got and "solo" not in got
