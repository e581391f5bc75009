"""Tests for F4 namespace pruning, U3/J3 outlink resolution, and the eval
harness (SO2/SO3/A13)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gossiphs_spark.evalx import bucketed_quality, false_negatives, precision_recall
from gossiphs_spark.operators.namespaces import prune_by_namespace_depth
from gossiphs_spark.operators.outlinks import link_outlinks_to_pages, resolve_outlinks

MENTIONS_DDL = (
    "url string, name string, kind string, start_byte long, end_byte long"
)


def test_namespace_depth_pruning(spark):
    # recasts graph.rs:154-199: DEF inside one NAMESPACE dropped at level 0,
    # kept at level 1; REFs never dropped; NAMESPACE rows removed
    m = spark.createDataFrame(
        [
            ("u", "outer_def", "DEF", 5, 10),
            ("u", "inner_def", "DEF", 25, 30),
            ("u", "inner_ref", "REF", 35, 40),
            ("u", "block", "NAMESPACE", 20, 50),
        ],
        MENTIONS_DDL,
    )
    lvl0 = {(r["name"], r["kind"]) for r in prune_by_namespace_depth(m, 0).collect()}
    assert lvl0 == {("outer_def", "DEF"), ("inner_ref", "REF")}
    lvl1 = {(r["name"], r["kind"]) for r in prune_by_namespace_depth(m, 1).collect()}
    assert lvl1 == {("outer_def", "DEF"), ("inner_def", "DEF"), ("inner_ref", "REF")}


@pytest.mark.smoke
def test_outlink_resolution(spark):
    # mirrors the reference's relative/absolute/package ladder (graph.rs:51-95)
    imports = spark.createDataFrame(
        [
            ("https://a.com/x/page.html", "https://b.com/y.html"),   # absolute
            ("https://a.com/x/page.html", "./sib.html"),             # relative
            ("https://a.com/x/page.html", "../up.html"),             # parent
            ("https://a.com/x/page.html", "'https://c.com/q.html'"), # quote trim (F12)
            ("https://a.com/x/page.html", ""),                       # empty dropped
        ],
        "url string, name string",
    )
    got = {r["target"] for r in resolve_outlinks(imports).collect()}
    assert got == {
        "https://b.com/y.html",
        "https://a.com/x/sib.html",
        "https://a.com/up.html",
        "https://c.com/q.html",
    }


def test_outlink_page_linking(spark):
    imports = spark.createDataFrame(
        [
            ("https://a.com/x/p1.html", "https://a.com/x/p2.html"),
            ("https://a.com/x/p1.html", "https://b.com/zzz.html"),
        ],
        "url string, name string",
    )
    pages = spark.createDataFrame(
        [("https://a.com/x/p2.html",), ("https://b.com/known.html",)], "url string"
    )
    got = {
        (r["dst_url"], r["match_kind"])
        for r in link_outlinks_to_pages(imports, pages).collect()
    }
    assert ("https://a.com/x/p2.html", "exact") in got
    assert ("https://b.com/known.html", "same_host") in got


def test_precision_recall_and_fn(spark):
    got = spark.createDataFrame([("a", "b"), ("a", "c"), ("x", "y")], "s string, o string")
    exp = spark.createDataFrame([("a", "b"), ("a", "c"), ("p", "q")], "s string, o string")
    pr = precision_recall(got, exp)
    assert pr["tp"] == 2 and abs(pr["precision"] - 2 / 3) < 1e-12
    fn = {tuple(r) for r in false_negatives(got, exp).collect()}
    assert fn == {("p", "q")}


def test_bucketed_quality(spark):
    links = spark.createDataFrame(
        [("a", "b", 5), ("a", "c", 75), ("x", "y", 600)], "s string, o string, score long"
    )
    oracle = spark.createDataFrame([("a", "b"), ("x", "y")], "s string, o string")
    rows = {r["bucket"]: r for r in bucketed_quality(links, oracle, ["s", "o"]).collect()}
    assert rows["0-10"]["confirmed"] == 1
    assert rows["50-100"]["phantom"] == 1
    assert rows["500+"]["confirmed"] == 1


def test_langid_argmax_multiprofile(spark):
    """Multi-profile language-ID: the argmax must separate en from the
    deterministic 'rev' pseudo-language, and zero-hit docs guess unk."""
    from gossiphs_spark.operators.textquality import langid_argmax

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "eht tac tas no eht tam"),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["guess"], r["ratio"]) for r in langid_argmax(docs).collect()}
    assert got[1][0] == "en" and got[1][1] > 0
    assert got[2][0] == "rev" and got[2][1] > 0
    assert got[3] == ("unk", 0.0)
