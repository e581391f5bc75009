"""Cutoff-function property tests (FIXTURES.md §5).

Vectors and expectations re-derived from the reference formulas
(knee_cutoff_score / max_drop_cutoff_score, /root/reference/src/graph.rs:
420-480). A pure-Python oracle reimplements the formulas; the Spark window
implementation must match it on every vector, including the documented
example [100,95,90,10,8] → max-drop 90 (graph.rs:453-455).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gossiphs_spark.operators.ranking import group_cutoffs


def py_knee(desc_scores):
    if not desc_scores:
        return 0
    if len(desc_scores) <= 2:
        return desc_scores[-1]
    top = float(desc_scores[0])
    if top <= 0:
        return desc_scores[0]
    n = len(desc_scores)
    y_last = desc_scores[-1] / top
    best_i, best_dist = 0, float("-inf")
    for i in range(n):
        x = i / (n - 1)
        y = desc_scores[i] / top
        dist = (1.0 + (y_last - 1.0) * x) - y
        if dist > best_dist:
            best_dist, best_i = dist, i
    return desc_scores[best_i]


def py_max_drop(desc_scores):
    if not desc_scores:
        return 0
    if len(desc_scores) == 1:
        return desc_scores[0]
    best_i, best_drop = 1, float("-inf")
    for i in range(1, len(desc_scores)):
        prev, cur = float(desc_scores[i - 1]), float(desc_scores[i])
        if prev <= 0:
            continue
        drop = (prev - cur) / prev
        if drop > best_drop:
            best_drop, best_i = drop, i
    return desc_scores[best_i - 1]


VECTORS = [
    [100, 95, 90, 10, 8],      # documented example → max-drop 90
    [100],
    [100, 7],
    [5, 4, 3, 2, 1],
    [1000, 999, 998, 1],
    [10, 0],
    [0, 0, 0],
    [7, 7],                    # distinct() collapses dup scores upstream
    [50, 25, 12, 6, 3, 1],
    [100, 99, 98, 97, 96, 95, 94, 93, 92, 91, 90, 89, 88, 2, 1],  # > def_limit head
]


@pytest.fixture(scope="module")
def cutoff_df(spark):
    rows = [(f"g{gi}", int(s)) for gi, vec in enumerate(VECTORS) for s in vec]
    df = spark.createDataFrame(rows, "grp string, s long")
    out = group_cutoffs(df, ["grp"], "s", def_limit=12)
    return {r["grp"]: r for r in out.collect()}


@pytest.mark.smoke
def test_documented_example(cutoff_df):
    r = cutoff_df["g0"]
    assert r["max_drop_cutoff"] == 90


@pytest.mark.parametrize("gi", range(len(VECTORS)))
def test_matches_reference_formula(cutoff_df, gi):
    vec = sorted(set(VECTORS[gi]), reverse=True)
    head = vec[: max(12, 2)]
    r = cutoff_df[f"g{gi}"]
    assert r["knee_cutoff"] == py_knee(head), f"knee mismatch on {head}"
    assert r["max_drop_cutoff"] == py_max_drop(head), f"maxdrop mismatch on {head}"
    assert r["cutoff"] == max(py_knee(head), py_max_drop(head))


def test_attach_cutoffs_matches_group_cutoffs(spark):
    """The join-free window variant must agree with the reference-formula
    variant on every vector (plus multi-row-per-score groups)."""
    from gossiphs_spark.operators.ranking import attach_cutoffs

    rows = []
    for gi, vec in enumerate(VECTORS):
        for j, s in enumerate(vec):
            # two rows per score value to exercise marker selection
            rows.append((f"g{gi}", int(s), j * 2))
            rows.append((f"g{gi}", int(s), j * 2 + 1))
    df = spark.createDataFrame(rows, "grp string, s long, id long")
    expected = {
        r["grp"]: r["cutoff"]
        for r in group_cutoffs(df, ["grp"], "s", def_limit=12).collect()
    }
    got_df = attach_cutoffs(df, ["grp"], "s", ["id"], def_limit=12)
    got = {}
    for r in got_df.collect():
        got.setdefault(r["grp"], set()).add(r["cutoff"])
    for g, exp in expected.items():
        assert got[g] == {exp}, f"{g}: attach={got[g]} group={exp}"
