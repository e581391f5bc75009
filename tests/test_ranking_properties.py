"""Property-based tests (hypothesis) for the knee/max-drop cutoffs: the
Spark window implementation must match the pure-Python re-derivation of
the reference formulas on arbitrary score vectors, and pruning invariants
must hold (top-1 always kept, cap respected)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tests.test_ranking import py_knee, py_max_drop


score_vectors = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30)


@given(vec=score_vectors)
@settings(max_examples=300, deadline=None)
def test_python_formula_invariants(vec):
    desc = sorted(set(vec), reverse=True)
    knee = py_knee(desc)
    drop = py_max_drop(desc)
    assert knee in desc
    assert drop in desc
    # the combined cutoff never exceeds the top score → top-1 always survives
    assert max(knee, drop) <= desc[0]


@given(vecs=st.lists(score_vectors, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_spark_matches_python_oracle(spark, vecs):
    from gossiphs_spark.operators.ranking import group_cutoffs

    rows = [
        (f"g{gi}", int(s)) for gi, vec in enumerate(vecs) for s in vec
    ]
    df = spark.createDataFrame(rows, "grp string, s long")
    out = {r["grp"]: r for r in group_cutoffs(df, ["grp"], "s", def_limit=12).collect()}
    for gi, vec in enumerate(vecs):
        desc = sorted(set(vec), reverse=True)[:12]
        r = out[f"g{gi}"]
        assert r["knee_cutoff"] == py_knee(desc), (desc, r)
        assert r["max_drop_cutoff"] == py_max_drop(desc), (desc, r)
