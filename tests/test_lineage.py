"""Kill/resume property of the lineage-checkpointed materialization
(north rule: a killed run resumes idempotently from the last committed
snapshot; recasts the reference's blob-keyed cache semantics,
/root/reference/src/cache.rs:78-158 round-trip tests)."""

from __future__ import annotations

import os
import shutil

import pytest

from gossiphs_spark import lineage
from gossiphs_spark.datagen import pages_df


@pytest.fixture()
def outdirs(tmp_path):
    a, b = str(tmp_path / "oneshot"), str(tmp_path / "resumed")
    yield a, b
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)


def test_kill_resume_equals_oneshot(spark, outdirs):
    oneshot_dir, resumed_dir = outdirs
    pages, _, _ = pages_df(spark, n_pages=40, seed=3)

    done = lineage.materialize_triples(spark, pages, oneshot_dir, "run-a", n_buckets=4)
    assert len(done) == 4
    expected = {tuple(r) for r in lineage.read_triples(spark, oneshot_dir).collect()}

    # killed run: commits 2 buckets then dies
    with pytest.raises(RuntimeError, match="simulated kill"):
        lineage.materialize_triples(
            spark, pages, resumed_dir, "run-b", n_buckets=4, fail_after=2
        )
    assert len(lineage.committed_buckets(resumed_dir)) == 2

    # resume: only the missing buckets are recomputed
    done2 = lineage.materialize_triples(spark, pages, resumed_dir, "run-b2", n_buckets=4)
    assert len(done2) == 2
    got = {tuple(r) for r in lineage.read_triples(spark, resumed_dir).collect()}
    assert got == expected

    # idempotency: a third invocation is a no-op
    assert lineage.materialize_triples(spark, pages, resumed_dir, "run-b3", n_buckets=4) == []


def test_read_triples_ignores_uncommitted_dirs(spark, tmp_path):
    """A reader must see ONLY lineage-committed buckets: stray directories
    matching the committed naming (torn copies, older layouts, a rename
    that landed without its lineage row) are invisible."""
    out = str(tmp_path / "stray")
    pages, _, _ = pages_df(spark, n_pages=20, seed=5)
    lineage.materialize_triples(spark, pages, out, "run-s", n_buckets=2)
    expected = lineage.read_triples(spark, out).count()

    # stray dir that a glob would match but no lineage row commits
    stray = os.path.join(out, "triples_bucket=00099")
    lineage.read_triples(spark, out).limit(5).write.parquet(stray)
    assert lineage.read_triples(spark, out).count() == expected

    # empty output dir: explicit error, not an empty scan
    with pytest.raises(FileNotFoundError):
        lineage.read_triples(spark, str(tmp_path / "nothing"))


def test_lineage_rows_recorded(spark, tmp_path):
    out = str(tmp_path / "lin")
    pages, _, _ = pages_df(spark, n_pages=20, seed=5)
    lineage.materialize_triples(spark, pages, out, "run-x", n_buckets=2)
    import json

    with open(os.path.join(out, lineage.LINEAGE_FILE)) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2
    for r in recs:
        assert r["stage"] == "triples"
        assert r["triple_count"] > 0
        assert r["url_min"] <= r["url_max"]
        assert r["warc_ts_watermark"]
