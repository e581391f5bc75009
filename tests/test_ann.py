"""ANN search-join quality gate: IVF top-k must reach recall >= 0.9 vs
brute-force cosine top-k on the clustered fixture (VERDICT r1 item 5).

The raw embeddings table is isotropic noise — no index can prune it (the
docstrings in operators/ann.py and plans/queries._emb_clustered record
the measured negative results) — so recall is asserted on the same
deterministic label-clustered derivation the oracle query uses.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gossiphs_spark.operators.ann import cosine, ivf_search
from gossiphs_spark.plans.queries import _emb_clustered

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def split(spark):
    emb = _emb_clustered(spark, SF_DIR).cache()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    cands = emb.filter(F.col("vec_id") >= 5)
    return queries, cands


def brute_topk(queries, cands, k=10):
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.crossJoin(F.broadcast(queries))
        .select("query_id", "vec_id", F.round(cosine("q", "v"), 4).alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


@pytest.mark.smoke
def test_ivf_recall_vs_brute_force(spark, split):
    queries, cands = split
    brute = {
        (r["query_id"], r["vec_id"]) for r in brute_topk(queries, cands).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(cands, queries, n_centroids=16, nprobe=3, k=10).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ivf_scans_fraction_only(spark, split):
    """The search join must touch only probed buckets — candidate rows
    scored ≈ (nprobe/n_centroids) of the corpus, not all of it."""
    from gossiphs_spark.operators.ann import ivf_assign, sample_centroids

    queries, cands = split
    cents = sample_centroids(cands, 16)
    assigned = ivf_assign(cands, cents).cache()
    n_all = assigned.count()
    probed = (
        ivf_search(cands, queries, n_centroids=16, nprobe=3, k=1 << 30)
        .select("query_id", "vec_id").distinct().groupBy("query_id").count()
    )
    worst = probed.agg(F.max("count")).collect()[0][0]
    assert worst < 0.5 * n_all, f"scanned {worst}/{n_all} candidates"


def test_ivf_plan_has_no_crossjoin_on_candidates(spark, split):
    """Candidate-side scoring must be an equi/broadcast join on cid, never
    a cartesian product against the query set (the scale gap VERDICT
    flagged in ann_cosine_topk)."""
    queries, cands = split
    plan = ivf_search(cands, queries)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _adversarial_emb(spark, n=400, n_clusters=8, dim=16):
    """Fixture where first-n-by-id centroid sampling measurably fails:
    vec_ids 0..19 all belong to ONE cluster, so first-n sampling seeds
    every centroid inside it; assignment of the other clusters' vectors
    to those junk centroids is then noise-driven, so at nprobe=1 the
    query's probed bucket and its true neighbors' buckets disagree.
    Deterministic (md5 signs + md5 noise), no random."""
    from gossiphs_spark.functions import md5_long

    e = spark.range(n).select(F.col("id").cast("long").alias("vec_id"))
    label = F.when(F.col("vec_id") < 20, F.lit(0)).otherwise(F.col("vec_id") % n_clusters)
    e = e.withColumn("label", label)
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def comp(d):
        sgn = F.when(
            md5_long(F.concat(F.col("label").cast("string"), F.lit("#"), d.cast("string"))) % 2 == 0,
            F.lit(2.0),
        ).otherwise(F.lit(-2.0))
        noise = 3.0 * (
            (
                md5_long(F.concat(F.col("vec_id").cast("string"), F.lit("@"), d.cast("string"))) % 1000
            ) / 1000.0 - 0.5
        )
        return sgn + noise

    return e.select("vec_id", F.transform(dims, comp).alias("v"))


def _recall(queries, cands, approx_rows, k=10):
    brute = {(r["query_id"], r["vec_id"]) for r in brute_topk(queries, cands, k).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    return len(brute & approx) / len(brute)


def test_trained_centroids_beat_first_n_sampling(spark):
    """k-means-lite training (train_centroids) must retain recall >= 0.9
    on the adversarial id-clustered fixture where first-n-by-id sampling
    measurably fails (VERDICT r2 item 6)."""
    emb = _adversarial_emb(spark).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 21).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    cands = emb.filter(F.col("vec_id") % 50 != 21).cache()

    # n_centroids matches the cluster count; nprobe=1 exposes the probe↔
    # assignment disagreement that junk centroids cause (measured: sampled
    # 0.64 vs trained 1.0 on this fixture)
    sampled = ivf_search(cands, queries, n_centroids=8, nprobe=1, k=10).collect()
    r_sampled = _recall(queries, cands, sampled)
    trained = ivf_search(
        cands, queries, n_centroids=8, nprobe=1, k=10, train_iters=2
    ).collect()
    r_trained = _recall(queries, cands, trained)
    assert r_sampled < 0.9, f"fixture not adversarial (sampled recall {r_sampled})"
    assert r_trained >= 0.9, f"trained recall {r_trained}"
    assert r_trained > r_sampled
    emb.unpersist()
    cands.unpersist()


def test_train_centroids_deterministic(spark):
    from gossiphs_spark.operators.ann import train_centroids

    emb = _adversarial_emb(spark, n=100)
    a = sorted(map(tuple, train_centroids(emb, 8, iters=2).collect()))
    b = sorted(map(tuple, train_centroids(emb, 8, iters=2).collect()))
    assert a == b


def test_neardup_oversized_bucket_warns(spark, caplog):
    """Bucket-size visibility (ADVICE r2): a degenerate quantizer (1
    centroid = everything in one bucket) must log, not silently go
    quadratic."""
    import logging

    from gossiphs_spark.operators.ann import neardup_pairs, release_caches

    emb = _adversarial_emb(spark, n=60)
    with caplog.at_level(logging.WARNING, logger="gossiphs_spark.operators.ann"):
        pairs = neardup_pairs(emb, n_centroids=1, nassign=1, warn_bucket_frac=0.5)
        pairs.count()
    assert any("largest IVF bucket" in r.message for r in caplog.records)
    # the warn path caches the assignment frame — scoped release must
    # actually unpersist it (ADVICE r4: repeated calls leak storage memory)
    cached = pairs._gossiphs_caches
    assert cached and cached[0].storageLevel.useMemory
    release_caches(pairs)
    assert not cached[0].storageLevel.useMemory


def test_neardup_pairs_recall_vs_brute_force(spark):
    """dd family, 5th member: IVF-blocked near-dup pairs must find >= 0.9
    of the brute-force cos >= 0.6 pairs on the clustered fixture, and
    never emit a pair below threshold."""
    from gossiphs_spark.operators.ann import cosine, neardup_pairs

    emb = _emb_clustered(spark, SF_DIR)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in (
            a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", F.round(cosine("va", "vb"), 4).alias("cos"))
            .filter(F.col("cos") >= 0.6).collect()
        )
    }
    got_rows = neardup_pairs(emb, n_centroids=16, threshold=0.6).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in got_rows}
    assert brute, "fixture produced no near-dup pairs — vacuous"
    assert all(r["cos"] >= 0.6 for r in got_rows)
    assert got <= brute
    recall = len(got & brute) / len(brute)
    assert recall >= 0.9, f"near-dup recall {recall}"


def test_neardup_bucket_cap_bounds_pairs(spark, caplog):
    """Adversarial single-cluster corpus: every vector lands in one IVF
    bucket, so the within-bucket self-join is quadratic (C(200,2)=19900
    pairs per assignment). max_bucket_size must hard-bound the pair work
    via deterministic hash sub-buckets AND log the split — never a silent
    cap."""
    import logging

    from gossiphs_spark.operators.ann import neardup_pairs, release_caches

    n = 200
    # all vectors ≈ e1 + tiny id-dependent noise in dims 2-4 → one cluster
    v = F.array(
        F.lit(1.0),
        (F.col("id") % 7).cast("double") / 1000.0,
        (F.col("id") % 11).cast("double") / 1000.0,
        (F.col("id") % 13).cast("double") / 1000.0,
    )
    emb = spark.range(n).select(F.col("id").alias("vec_id"), v.alias("v"))

    capped = None
    with caplog.at_level(logging.WARNING, logger="gossiphs_spark.operators.ann"):
        capped_df = neardup_pairs(
            emb, n_centroids=4, threshold=0.9, max_bucket_size=25
        )
        capped = capped_df.count()
        # the cap path REBINDS `assigned` to the split frame before the
        # result is built — release must still unpersist the frame that
        # was actually cached (regression: releasing the uncached split
        # frame leaked the cached base forever)
        cap_cached = capped_df._gossiphs_caches
        assert cap_cached and cap_cached[0].storageLevel.useMemory
        release_caches(capped_df)
        assert not cap_cached[0].storageLevel.useMemory
    assert any("oversized IVF bucket" in r.message for r in caplog.records)

    # ~everything is a near-dup: unbounded within-bucket pairing would
    # score ≈ C(200,2) ≈ 19900 pairs; 25-row sub-buckets bound it to
    # ~ceil(400/25) buckets × C(~25,2) ≈ 5k — assert well under half
    assert 0 < capped < 10000

    # and the cap is a no-op on well-quantized data: dd_embedding_neardup's
    # path (no max_bucket_size) is unchanged by construction (default None)
    uncapped = neardup_pairs(emb, n_centroids=4, threshold=0.9).count()
    assert uncapped > capped  # the cap really dropped straddling pairs


def test_neardup_blas_kernel_matches_sql_path(spark):
    """The Arrow/BLAS within-bucket pairwise kernel (default) must emit
    exactly the SQL equi-self-join path's rows — same pair set, same
    rounded cos — on the clustered fixture AND under bucket capping
    (string sub-bucket cids flow through the groupBy kernel too)."""
    from gossiphs_spark.operators.ann import neardup_pairs

    emb = _emb_clustered(spark, SF_DIR)
    as_set = lambda df: {  # noqa: E731
        (r["vec_a"], r["vec_b"], r["cos"]) for r in df.collect()
    }
    blas = as_set(neardup_pairs(emb, n_centroids=16, threshold=0.6))
    sql = as_set(neardup_pairs(emb, n_centroids=16, threshold=0.6,
                               pairwise="sql"))
    assert blas and blas == sql

    capped_blas = neardup_pairs(emb, n_centroids=4, threshold=0.6,
                                max_bucket_size=40)
    capped_sql = neardup_pairs(emb, n_centroids=4, threshold=0.6,
                               max_bucket_size=40, pairwise="sql")
    try:
        assert as_set(capped_blas) == as_set(capped_sql)
    finally:
        from gossiphs_spark.operators.ann import release_caches

        release_caches(capped_blas)
        release_caches(capped_sql)


def test_neardup_blas_drops_zero_norm_vectors(spark):
    """Zero-norm embeddings have undefined cosine: the SQL path yields
    NULL (dropped by the threshold filter, never a divide-by-zero job
    kill) and the BLAS kernel must drop the same pairs — while still
    pairing the surrounding non-degenerate vectors."""
    from gossiphs_spark.operators.ann import neardup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # near-dup of 1
        (3, [0.0, 0.0, 0.0]),   # degenerate
        (4, [0.0, 0.0, 0.0]),   # degenerate
    ]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    as_set = lambda df: {  # noqa: E731
        (r["vec_a"], r["vec_b"], r["cos"]) for r in df.collect()
    }
    # n_centroids > n rows → every vector lands in (all) the same buckets
    blas = as_set(neardup_pairs(emb, n_centroids=4, threshold=0.5))
    sql = as_set(neardup_pairs(emb, n_centroids=4, threshold=0.5,
                               pairwise="sql"))
    assert blas == sql
    assert {(a, b) for a, b, _ in blas} == {(1, 2)}


def test_neardup_blas_drops_null_embeddings(spark):
    """A NULL embedding must not kill the BLAS kernel batch: its pairs
    drop (the SQL path's NULL-cosine outcome) and the non-null rows in
    the same bucket still pair."""
    from gossiphs_spark.operators.ann import neardup_pairs

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None)],
        "vec_id long, v array<double>",
    )
    got = {(r["vec_a"], r["vec_b"])
           for r in neardup_pairs(emb, n_centroids=4, threshold=0.5).collect()}
    assert got == {(1, 2)}


def test_blas_tiling_is_invisible(spark):
    """The row-block tiling inside the BLAS kernel must not change the
    emitted pairs: a pathologically small block size (forcing one row
    per matmul) yields exactly the single-tile result."""
    from gossiphs_spark.operators.ann import _pairwise_cosine_blas

    emb = _emb_clustered(spark, SF_DIR).limit(60)
    assigned = emb.select(F.lit(0).alias("cid"), "vec_id", "v")
    as_set = lambda df: {  # noqa: E731
        (r["vec_a"], r["vec_b"], r["cos"]) for r in df.collect()
    }
    one_tile = as_set(_pairwise_cosine_blas(assigned, 0.6))
    tiny = as_set(_pairwise_cosine_blas(assigned, 0.6, block_bytes=1))
    assert one_tile and one_tile == tiny


from hypothesis import given, settings, strategies as st  # noqa: E402

_vec = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
              allow_infinity=False) | st.just(0.0),
    min_size=3, max_size=3,
)


@given(st.lists(_vec, min_size=2, max_size=10))
@settings(max_examples=10, deadline=None)
def test_blas_sql_kernels_agree_on_random_vectors(spark, vecs):
    """Property pin for the two pairwise kernels beyond the clustered
    fixture: on arbitrary small vector sets — negatives, exact zeros,
    duplicated vectors, mixed magnitudes (bounded so neither engine's
    norm overflows) — the BLAS and SQL paths emit the same pair-id set,
    with cos agreeing to the shared 4-dp rounding grid (1 ulp of the
    grid tolerated: np.round is half-even, Spark's round half-up, and
    the two may sit on opposite sides of an exact .00005 boundary)."""
    from gossiphs_spark.operators.ann import neardup_pairs

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>"
    )
    as_map = lambda df: {  # noqa: E731
        (r["vec_a"], r["vec_b"]): r["cos"] for r in df.collect()
    }
    blas = as_map(neardup_pairs(emb, n_centroids=4, threshold=0.3))
    sql = as_map(neardup_pairs(emb, n_centroids=4, threshold=0.3,
                               pairwise="sql"))
    # a pair may enter exactly one set only when its cos sits on the
    # threshold's own rounding boundary (same half-even/half-up ulp)
    for k in set(blas) ^ set(sql):
        assert abs((blas.get(k) or sql.get(k)) - 0.3) <= 1e-4 + 1e-12
    assert all(abs(blas[k] - sql[k]) <= 1e-4 + 1e-12
               for k in set(blas) & set(sql))
