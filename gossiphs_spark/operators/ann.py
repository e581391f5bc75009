"""Approximate nearest-neighbor search over embedding columns.

Builder's-brief operator (no gossiphs analog): composes the bucketed
search join that `ann_lsh_buckets` (profiling) and `ann_cosine_topk`
(brute force) left apart — query → coarse quantizer probe → cosine-score
ONLY the candidates in probed buckets → top-k.

Index family: IVF-Flat. Two deterministic quantizers: sampled centroids
(the first ``n_centroids`` vectors by id — trivially oracle-portable,
fine for well-spread ids) and k-means-lite trained centroids
(train_centroids: hash-spread seeds + Lloyd rounds — required when ids
correlate with cluster structure; see tests/test_ann.py's adversarial
fixture). Both are pure functions of the data, so resume/retry-safe.
Sign-random-projection LSH was evaluated and rejected for the default:
on isotropic data the per-bit collision prob for a cos≈0.3 neighbor is
~0.61, so usable recall needs so many OR-tables that the candidate set
degenerates to a full scan. IVF follows the data's cluster structure
instead. (Measured on the synthetic fixture: recall 1.0 scanning 19% of
candidates at n_centroids=16, nprobe=3.)

Scale shape (10^9+ vectors, 10^4+ centroids):
  * the centroid table is the ONLY broadcast (n_centroids rows);
  * assignment is a map-side crossJoin with that dim table + one
    aggregation — no vector-vector shuffle;
  * the probe table (queries × nprobe) broadcasts, so the search join is
    map-side too; the final top-k is one window over scored candidates,
    partitioned by query.

Linear stages (assignment, probe scoring) are JVM-side array algebra
(zip_with/aggregate). The QUADRATIC stage — within-bucket pairwise
cosine — is an Arrow-batched BLAS kernel instead (applyInPandas, one
bucket per group → normalized matmul): Spark's higher-order array
functions are interpreted per element, not codegen'd, so at bucket
size m and dim d the SQL form pays ~m²·d interpreted lambda steps where
one dgemm does the same work vectorized — the same shape FAISS's
IVFFlat list scan uses. Measured on the 2k-vector sf0.1 fixture
(196k surviving pairs): 36.2 s → 2.2 s warm (~16×; ~7× with cold
Python workers). The `pairwise="sql"` fallback is kept and pinned
output-identical by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """NULL (not an ANSI divide-by-zero job kill) for zero-norm vectors:
    one degenerate embedding must not fail a 100 TB run. NULL similarity
    ranks below every real score in the max/top-k aggregations."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def sample_centroids(cands: DataFrame, n_centroids: int = 16) -> DataFrame:
    """(vec_id, v) → (cid, cv): first n vectors by id. Deterministic; at
    scale swap in k-means centroids (train_centroids below) without
    touching the search join."""
    return (
        cands.orderBy("vec_id").limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )


def train_centroids(cands: DataFrame, n_centroids: int = 16,
                    iters: int = 2) -> DataFrame:
    """Deterministic k-means-lite: hash-spread seeding (a seeded stand-in
    for k-means|| sampling — md5(vec_id) ordering decorrelates the seeds
    from any id↔cluster correlation that breaks first-n-by-id sampling)
    followed by ``iters`` Lloyd rounds, everything DataFrame algebra:

      assign:   broadcast-crossJoin with the k-row centroid dim + argmax
                (map-side — no vector-vector shuffle)
      update:   posexplode to (cid, dim, val) → mean → re-assembled array

    Centroids collect to the driver between rounds (k × dim doubles — the
    model, not data; this is how k-means training materializes its state
    on any cluster). Empty clusters keep their previous centroid. Pure
    function of (cands, n_centroids, iters) → resume/retry/oracle-safe."""
    from gossiphs_spark.functions import md5_long

    spark = cands.sparkSession
    # seed pick is a distributed top-k (TakeOrderedAndProject), NOT a
    # global row_number window — that would funnel all 10^9 vectors
    # through one task (the r1 dense_ids anti-pattern). The window below
    # only numbers the k survivors.
    w = Window.orderBy("_h", "vec_id")
    seeds = (
        cands.select("vec_id", "v",
                     md5_long(F.col("vec_id").cast("string")).alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(n_centroids)
        .withColumn("_r", F.row_number().over(w))
        .select((F.col("_r") - 1).cast("long").alias("cid"), F.col("v").alias("cv"))
    )
    cents = [(r["cid"], list(r["cv"])) for r in seeds.collect()]
    schema = "cid long, cv array<double>"
    for _ in range(max(iters, 0)):
        cdf = spark.createDataFrame(cents, schema)
        assigned = (
            cands.crossJoin(F.broadcast(cdf))
            .select("vec_id", "v", "cid", F.round(cosine("v", "cv"), 6).alias("cosc"))
            .groupBy("vec_id")
            .agg(
                F.max(F.struct(F.col("cosc"), (-F.col("cid")).alias("ncid"), F.col("v").alias("v"))).alias("m")
            )
            .select((-F.col("m.ncid")).alias("cid"), F.col("m.v").alias("v"))
        )
        means = (
            assigned.select("cid", F.posexplode("v").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(F.avg("x").alias("mx"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "mx"))),
                    lambda s: s["mx"],
                ).alias("cv")
            )
        )
        new = {r["cid"]: list(r["cv"]) for r in means.collect()}
        # empty clusters keep their previous centroid
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return spark.createDataFrame(cents, schema).select("cid", "cv")


def ivf_assign(cands: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every candidate to its nearest centroid (max cosine, ties →
    min cid). Map-side: broadcast crossJoin with the tiny centroid dim,
    then one aggregation — the argmax is max(struct(cos, -cid))."""
    cc = (
        cands.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "v", "cid",
            F.round(cosine("v", "cv"), 6).alias("cosc"),
        )
    )
    best = (
        cc.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cosc"), (-F.col("cid")).alias("ncid"))).alias("m"))
        .select("vec_id", (-F.col("m.ncid")).alias("cid"))
    )
    return cands.join(best, "vec_id")


def _pairwise_cosine_blas(assigned: DataFrame, threshold: float,
                          block_bytes: int = 1 << 28) -> DataFrame:
    """Within-bucket pairwise cosine as tiled BLAS calls per bucket:
    applyInPandas groups assigned(cid, vec_id, v) by cid, row-normalizes
    the bucket matrix, and scans the upper triangle of M·Mᵀ in row
    blocks — the FAISS-IVFFlat list-scan shape. Emits (vec_a < vec_b,
    cos) at cos ≥ threshold, cos rounded to 4 (matches the SQL path;
    both ride double precision, and a pair landing in several shared
    buckets rounds identically, so the caller's distinct() dedups it).
    NULL and zero-norm vectors have undefined cosine → their pairs are
    dropped (the SQL path's NULL-comparison outcome).

    Tiling keeps the working set at O(T·m) doubles — a block of T rows
    against the whole bucket, T sized so one block is ≤ ``block_bytes``
    (default 256 MB) — never the O(m²) full similarity matrix, so a
    degenerate bucket degrades the way the SQL join did (quadratic
    TIME, bounded memory) instead of one allocation of m² doubles.
    The survivor lists are threshold-filtered per block, so their size
    tracks the real near-dup pair count, not m². neardup_pairs'
    max_bucket_size cap remains the hard bound on the time side."""
    import numpy as np
    import pandas as pd

    empty = {"vec_a": pd.Series(dtype="int64"),
             "vec_b": pd.Series(dtype="int64"),
             "cos": pd.Series(dtype="float64")}

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["v"].notna()]
        if len(pdf) < 2:
            return pd.DataFrame(empty)
        mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.linalg.norm(mat, axis=1)
        ids = pdf["vec_id"].to_numpy()[norms != 0]
        if len(ids) < 2:
            return pd.DataFrame(empty)
        unit = mat[norms != 0] / norms[norms != 0][:, None]
        n = len(ids)
        t = max(1, min(n, block_bytes // (8 * n)))
        out_a, out_b, out_c = [], [], []
        for s in range(0, n - 1, t):
            cos = np.round(unit[s:s + t] @ unit.T, 4)
            rows, cols = np.nonzero(cos >= threshold)
            keep = cols > rows + s  # strict upper triangle, global index
            a, b = ids[rows[keep] + s], ids[cols[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(cos[rows[keep], cols[keep]])
        return pd.DataFrame({"vec_a": np.concatenate(out_a),
                             "vec_b": np.concatenate(out_b),
                             "cos": np.concatenate(out_c)})

    return assigned.groupBy("cid").applyInPandas(
        per_bucket, "vec_a long, vec_b long, cos double"
    )


def neardup_pairs(emb: DataFrame, n_centroids: int = 16,
                  threshold: float = 0.6, nassign: int = 2,
                  train_iters: int = 0,
                  warn_bucket_frac: float | None = None,
                  max_bucket_size: int | None = None,
                  pairwise: str = "blas") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via IVF blocking: every
    vector is assigned to its ``nassign`` nearest centroids (multiple
    assignment — the standard cure for clusters straddling a centroid
    boundary: single assignment measured recall 0.68, double 1.0 on the
    fixture), pairwise cosine runs ONLY within a shared bucket
    (equi-self-join on cid — never all-pairs), pairs at cos ≥ threshold
    survive. → (vec_a, vec_b, cos), vec_a < vec_b, deduped across buckets.

    ``train_iters > 0`` swaps the sampled centroids for k-means-trained
    ones (train_centroids). ``warn_bucket_frac`` opts into bucket-size
    visibility ('no silent caps'): when the largest bucket exceeds that
    fraction of all assignments, log a warning — the within-bucket
    self-join is quadratic in the largest bucket, so a degenerate
    quantizer should be loud, not slow. Costs one extra aggregation job,
    hence opt-in.

    ``max_bucket_size`` HARD-bounds the quadratic stage: buckets over the
    cap are split deterministically into ceil(size/cap) hash sub-buckets
    (md5 of vec_id — stable across runs/partitionings), so per-bucket
    pair work is O(cap²) no matter how degenerate the quantizer gets.
    Pairs straddling a split are LOST — the cap trades recall for bounded
    work, so every split is logged loudly with the size ratio (never a
    silent cap). At 10^9 vectors one adversarial bucket of 10^7 would
    otherwise mean 10^14 cosine evaluations in one task's join group.

    ``pairwise`` picks the within-bucket kernel: "blas" (default) runs
    one Arrow-batched normalized matmul per bucket (_pairwise_cosine_blas);
    "sql" keeps the equi-self-join + interpreted array-cosine form. The
    two are output-identical (pinned in tests/test_ann.py) — "sql" exists
    as the no-Python-workers fallback.

    The recall gate vs the unblocked brute-force pair set lives in
    tests/test_ann.py."""
    cents = (
        train_centroids(emb, n_centroids, train_iters)
        if train_iters > 0 else sample_centroids(emb, n_centroids)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosc"), F.asc("cid"))
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", F.round(cosine("v", "cv"), 6).alias("cosc"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nassign)
        .select("cid", "vec_id", "v")
    )
    capping = max_bucket_size is not None and max_bucket_size > 0
    if warn_bucket_frac is not None or capping:
        import logging

        log = logging.getLogger(__name__)
        # assignment (the crossJoin + window, the expensive stage) now has
        # extra consumers — cache it so the stats job and both self-join
        # sides read one materialization. ONE per-bucket aggregation
        # (≤ nassign × n_centroids rows, driver-safe) feeds both the warn
        # check and the split table.
        assigned = assigned.cache()
        # keep a handle on the frame that was ACTUALLY cached — the cap
        # path below rebinds `assigned` to a derived (uncached) split
        # frame, and release_caches must unpersist the cached base
        cached_assigned = assigned
        size_rows = assigned.groupBy("cid").agg(F.count("*").alias("n")).collect()
        total = sum(r["n"] for r in size_rows)
        mx = max((r["n"] for r in size_rows), default=0)
        if warn_bucket_frac is not None and total and mx > warn_bucket_frac * total:
            log.warning(
                "neardup_pairs: largest IVF bucket holds %d of %d assignments "
                "(> %.0f%%) — pairwise stage degenerates toward quadratic; "
                "train centroids (train_iters>0) or raise n_centroids",
                mx, total, 100 * warn_bucket_frac,
            )
        if capping:
            import math

            from gossiphs_spark.functions import md5_long

            over = [r for r in size_rows if r["n"] > max_bucket_size]
            if over:
                log.warning(
                    "neardup_pairs: splitting %d oversized IVF bucket(s) "
                    "(largest %d rows > cap %d; %d rows affected) — pairs "
                    "straddling a split are not scored; train centroids "
                    "(train_iters>0) or raise n_centroids to restore recall",
                    len(over), mx, max_bucket_size,
                    sum(r["n"] for r in over),
                )
                # split table is one row per bucket → broadcast; within an
                # oversized bucket the sub-bucket id is a pure hash of
                # vec_id, so the split is deterministic and shuffle-free
                splits = assigned.sparkSession.createDataFrame(
                    [(r["cid"], math.ceil(r["n"] / max_bucket_size))
                     for r in size_rows],
                    "cid long, nsplit long",
                )
                assigned = (
                    assigned.join(F.broadcast(splits), "cid")
                    .withColumn(
                        "cid",
                        F.concat_ws(
                            "#", F.col("cid").cast("string"),
                            (md5_long(F.col("vec_id").cast("string"))
                             % F.col("nsplit")).cast("string"),
                        ),
                    )
                    .drop("nsplit")
                )
    if pairwise == "blas":
        out = _pairwise_cosine_blas(assigned, threshold).distinct()
    else:
        a = assigned.select(
            "cid", F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
        )
        b = assigned.select(
            "cid", F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")
        )
        out = (
            a.join(b, "cid")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", F.round(cosine("va", "vb"), 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
            .distinct()
        )
    if warn_bucket_frac is not None or capping:
        # the assignment was cached above so the stats job and both
        # self-join sides read one materialization; expose the CACHED
        # frame on the result for scoped release (mirrors
        # GraphTables.release_caches) so repeated calls in a long-lived
        # session don't accumulate storage memory.
        out._gossiphs_caches = [cached_assigned]  # type: ignore[attr-defined]
    return out


def release_caches(df: DataFrame) -> None:
    """Unpersist any frames an ANN operator cached while building ``df``.

    Call after the result is materialized (collected/written); a no-op
    for plans that never activated a caching path."""
    for cached in getattr(df, "_gossiphs_caches", ()):
        try:
            cached.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass


def ivf_search(cands: DataFrame, queries: DataFrame, n_centroids: int = 16,
               nprobe: int = 3, k: int = 10, train_iters: int = 0) -> DataFrame:
    """cands(vec_id, v) × queries(query_id, q) → (query_id, vec_id, cos, rnk).

    Scores only candidates assigned to one of the query's ``nprobe``
    nearest centroids — the bucketed ANN search join. ``train_iters > 0``
    uses k-means-trained centroids (train_centroids) instead of the
    first-n sample; the search join is identical either way."""
    cents = (
        train_centroids(cands, n_centroids, train_iters)
        if train_iters > 0 else sample_centroids(cands, n_centroids)
    )
    assigned = ivf_assign(cands, cents)

    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cosc"), F.asc("cid"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "q", "cid", F.round(cosine("q", "cv"), 6).alias("cosc"))
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "q", "cid")
    )

    w_k = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cid")
        .select(
            "query_id", "vec_id",
            F.round(cosine("q", "v"), 4).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w_k).cast("long"))
        .filter(F.col("rnk") <= k)
    )
