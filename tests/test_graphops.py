"""Unit tests for graphops (salted agg, dense export, pairs, diff) and the
W4 output-level filter."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gossiphs_spark.operators.graphops import (
    dense_export,
    pairs_between,
    salted_sum,
    snapshot_diff,
)
from gossiphs_spark.operators.ranking import filter_related


@pytest.mark.smoke
def test_salted_sum_equals_plain_groupby(spark):
    rows = [("hot", f"u{i % 7}", i % 13) for i in range(500)] + [
        ("cold", "u1", 5), ("cold", "u2", 7)
    ]
    df = spark.createDataFrame(rows, "k string, salt string, v long")
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r["k"]: r["v"]
        for r in salted_sum(df, ["k"], "v", "salt", buckets=8).collect()
    }
    assert salted == plain


def test_dense_export_ids_contiguous(spark):
    rel = spark.createDataFrame(
        [("b", "a", 3), ("c", "a", 2), ("a", "b", 1)], "page string, other string, score long"
    )
    nodes, edges = dense_export(rel)
    ids = sorted(r["id"] for r in nodes.collect())
    assert ids == [0, 1, 2]
    # deterministic: sorted urls get ascending ids
    m = {r["url"]: r["id"] for r in nodes.collect()}
    assert m["a"] < m["b"] < m["c"]
    assert edges.count() == 3


def test_pairs_between(spark):
    edges = spark.createDataFrame(
        [("a", "b", "foo", 2), ("a", "c", "bar", 1)],
        "src_url string, dst_url string, name string, weight long",
    )
    got = pairs_between(edges, "a", "b").collect()
    assert len(got) == 1 and got[0]["name"] == "foo"


def test_snapshot_diff_states(spark):
    old = spark.createDataFrame([("a", "b"), ("a", "c")], "page string, other string")
    new = spark.createDataFrame([("a", "b"), ("a", "d")], "page string, other string")
    got = {(r["page"], r["other"]): r["state"] for r in snapshot_diff(old, new).collect()}
    assert got == {("a", "b"): "MODIFIED", ("a", "c"): "DELETED", ("a", "d"): "ADDED"}


def test_filter_related_w4(spark):
    # scores with an obvious knee at 90 (documented vector) + floor/cap knobs
    rows = [("p", f"o{i}", s) for i, s in enumerate([100, 95, 90, 10, 8])]
    rel = spark.createDataFrame(rows, "page string, other string, score long")
    # opt-out: both knobs 0 → unchanged (ref api.rs:71-73)
    assert filter_related(rel, ["page"], "score", "other").count() == 5
    # max cap 2 → top-2 kept
    capped = filter_related(rel, ["page"], "score", "other", file_max_links=2)
    assert {r["other"] for r in capped.collect()} == {"o0", "o1"}
    # knee cutoff alone (min=1, max=99): keeps the >= 90 cluster
    knee = filter_related(rel, ["page"], "score", "other",
                          file_min_links=1, file_max_links=99)
    assert {r["score"] for r in knee.collect()} == {100, 95, 90}


def test_markdown_vault_sink(spark, tmp_path):
    # S7: one markdown body per page, links ordered by score desc
    from gossiphs_spark.operators.sinks import markdown_links, write_markdown_vault

    rel = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 9), ("d", "a", 1)],
        "page string, other string, score long",
    )
    md = {r["page"]: r["md"] for r in markdown_links(rel).collect()}
    assert md["a"] == "- [[c]]\n- [[b]]"
    assert md["d"] == "- [[a]]"
    out = str(tmp_path / "vault")
    write_markdown_vault(rel, out)
    import glob

    assert len(glob.glob(out + "/dir=*/*.txt")) == 2


@pytest.mark.smoke
def test_file_metadata_arrays(spark):
    """A10 arrays (ref api.rs:128-142, 317-341): symbols/commits sorted,
    issues parsed from snapshot messages via the '#N' regex."""
    from pyspark.sql import functions as F

    from gossiphs_spark.datagen import pages_df
    from gossiphs_spark.operators.extract import extract_mentions
    from gossiphs_spark.operators.graphops import file_metadata

    pages, evidence, _ = pages_df(spark, n_pages=20, seed=3)
    m = extract_mentions(pages, columns=("url", "name", "kind", "start_byte"))
    out = file_metadata(m, evidence)
    rows = out.collect()
    assert len(rows) == 20
    with_issues = [r for r in rows if r["issues"]]
    assert with_issues, "no issues parsed from snapshot messages"
    for r in rows:
        assert list(r["symbols"]) == sorted(r["symbols"])
        assert list(r["commits"]) == sorted(set(r["commits"]))
        for i in r["issues"]:
            assert i.isdigit()
    # evidence without a msg column degrades to empty issues, not an error
    out2 = file_metadata(m, evidence.drop("msg"))
    assert all(r["issues"] == [] for r in out2.collect())


def test_dense_ids_no_single_partition_exchange(spark):
    """S5 dense ids must never funnel the node table through one task
    (VERDICT r1): two-phase rank keeps every exchange partitioned."""
    from gossiphs_spark.operators.graphops import dense_ids

    urls = spark.range(5000).selectExpr("concat('u://', id) AS url")
    out = dense_ids(urls)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # and the ids are still the exact global rank
    rows = sorted((r["url"], r["id"]) for r in out.collect())
    assert [i for _, i in rows] == sorted(i for _, i in rows)
    assert len({i for _, i in rows}) == 5000


def test_pagerank_cycle_is_uniform(spark):
    """On a 3-cycle with equal weights, rank is exactly 1/N every
    iteration: (1-d)/3 + d/3 = 1/3 — pins the recurrence constants."""
    from gossiphs_spark.operators.graphops import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "src string, dst string, w long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    for v in got.values():
        assert abs(v - 1.0 / 3.0) < 1e-9


def test_pagerank_star_and_weights(spark):
    """Hand-computed 3-iteration values: star a→{b,c}; dangling b, c keep
    only teleport mass flowing; weighted split 3:1 shifts rank to b."""
    from gossiphs_spark.operators.graphops import pagerank

    star = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1)], "src string, dst string, w long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(star).collect()}
    # after iter1 a=0.05 (teleport only); fixpoint b=c=0.05+0.85*0.5*0.05
    assert abs(got["a"] - 0.05) < 1e-9
    assert abs(got["b"] - 0.07125) < 1e-9
    assert abs(got["c"] - 0.07125) < 1e-9

    weighted = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, w long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(weighted).collect()}
    assert abs(got["b"] - (0.05 + 0.85 * 0.75 * 0.05)) < 1e-9
    assert abs(got["c"] - (0.05 + 0.85 * 0.25 * 0.05)) < 1e-9
    assert got["b"] > got["c"]


def test_pagerank_mass_bounded(spark):
    """Total rank mass stays in (0, 1]: teleport is conserved, dangling
    mass decays (documented simplification, mirrored in the oracle)."""
    from gossiphs_spark.operators.graphops import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "d", 1)],
        "src string, dst string, w long",
    )
    ranks = [r["rank"] for r in pagerank(edges, iters=5).collect()]
    assert all(r > 0 for r in ranks)
    assert 0.5 < sum(ranks) <= 1.0 + 1e-9


def test_neo4j_bulk_export(spark, tmp_path):
    """S9 analog: neo4j-admin bulk-import CSVs — header conventions and
    node/edge closure (every endpoint appears exactly once as a node)."""
    from gossiphs_spark.operators.sinks import write_neo4j_bulk

    rel = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 1), ("a", "c", 2)],
        "page string, other string, score long",
    )
    out = str(tmp_path / "neo")
    write_neo4j_bulk(rel, out)

    # data parts are header-less (per-part headers would be ingested as
    # rows by neo4j-admin); one-line header files lead the import list
    import glob
    nh = open(glob.glob(f"{out}/nodes_header/part-*")[0]).read().strip()
    rh = open(glob.glob(f"{out}/rels_header/part-*")[0]).read().strip()
    assert nh == "url:ID,:LABEL"
    assert rh == ":START_ID,:END_ID,weight:long,:TYPE"
    nodes = spark.read.schema("`url:ID` string, `:LABEL` string").csv(f"{out}/nodes")
    rels = spark.read.schema(
        "`:START_ID` string, `:END_ID` string, `weight:long` string, `:TYPE` string"
    ).csv(f"{out}/rels")
    assert {r["url:ID"] for r in nodes.collect()} == {"a", "b", "c"}
    assert nodes.count() == 3  # exactly once per endpoint
    got = {(r[":START_ID"], r[":END_ID"], r["weight:long"]) for r in rels.collect()}
    assert got == {("a", "b", "3"), ("b", "c", "1"), ("a", "c", "2")}
    assert {r[":TYPE"] for r in rels.collect()} == {"RELATED"}
