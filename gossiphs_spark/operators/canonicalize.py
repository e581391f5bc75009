"""U4 — entity canonicalization: blocking + MinHash-LSH + components
(SURVEY.md §2.9 U4; north_star requirement).

Generalizes the reference's cross-file symbol resolution (exact + base-
name matching, /root/reference/src/graph.rs:620-645) to fuzzy surface-form
canonicalization at corpus scale:

  1. BLOCK on the lowercase base segment (the reference's base-name
     equality is the degenerate block) — bounds candidate generation.
  2. MinHash signatures over character-3-gram shingles, md5-based
     deterministic permutations, banded (b bands × r rows) — candidate
     pairs are pairs sharing ≥1 (block, band, band_key) bucket, an
     EQUI-join, never a cross join.
  3. VERIFY candidates with exact shingle-set Jaccard ≥ threshold
     (cheap: only on the LSH survivors).
  4. Connected components over the verified-pair graph → entity_id =
     min md5_long of the component's members. Small graphs (≤ a
     pair-count guard) run as one driver union-find; larger ones as
     iterative distributed min-label propagation (deterministic,
     bounded iterations) — both output-identical by test.

Every stage is DataFrame algebra; determinism (seeded hashes, no rand)
keeps resume/retry idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gossiphs_spark.functions import base_name, md5_long


def _shingle_names(names: DataFrame, k: int = 3) -> DataFrame:
    """names(name) → (name, shingle) char-k-grams of the normalized form."""
    norm = F.lower(F.regexp_replace("name", r"[^A-Za-z0-9]", ""))
    n = names.withColumn("_norm", norm)
    idx = F.sequence(
        F.lit(1), F.greatest(F.length("_norm") - (k - 1), F.lit(1))
    )
    return (
        n.select("name", "_norm", F.explode(idx).alias("_i"))
        .select("name", F.expr(f"substring(_norm, _i, {k})").alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def minhash_signatures(names: DataFrame, n_perms: int = 16,
                       shingle_k: int = 3,
                       shingles: DataFrame | None = None) -> DataFrame:
    """(name, p, sig): md5-based min-hash per permutation. ``shingles``
    lets a caller share one (possibly cached) shingle table instead of
    re-deriving the explode+distinct pass."""
    spark = names.sparkSession
    sh = shingles if shingles is not None else _shingle_names(names, shingle_k)
    perms = spark.range(n_perms).select(F.col("id").cast("int").alias("p"))
    return (
        sh.crossJoin(F.broadcast(perms))
        .select(
            "name", "p",
            md5_long(F.concat_ws("#", "shingle", F.col("p").cast("string"))).alias("h"),
        )
        .groupBy("name", "p")
        .agg(F.min("h").alias("sig"))
    )


def lsh_candidate_pairs(names: DataFrame, n_perms: int = 16,
                        rows_per_band: int = 4, shingle_k: int = 3,
                        max_bucket_size: int | None = None,
                        shingles: DataFrame | None = None) -> DataFrame:
    """Blocked + banded candidate pairs (name_a < name_b).

    ``max_bucket_size`` HARD-bounds the bucket self-join's quadratic
    blow-up, the same guard (and the same trade) as neardup_pairs': a
    (block, band, band_key) bucket over the cap is split
    deterministically into ceil(size/cap) md5(name) sub-buckets, so
    per-bucket pair work is O(cap²) no matter how degenerate the
    signature gets — at 10^12 documents, 10^6 names sharing one band
    signature (boilerplate tokens, template artifacts) would otherwise
    mean 10^12 candidate pairs in ONE join group. Pairs straddling a
    split are LOST, which can leave one near-dup cluster as several
    components downstream — every split is logged loudly with sizes
    (never a silent cap). Default None = exact reference semantics
    (the fixture-scale oracles run uncapped)."""
    sig = minhash_signatures(names, n_perms, shingle_k, shingles=shingles)
    bands = (
        sig.withColumn("band", F.floor(F.col("p") / rows_per_band).cast("int"))
        .groupBy("name", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "sig"))),
                    lambda x: x["sig"].cast("string"),
                ),
            ).alias("band_key")
        )
        .withColumn(
            "block",
            # normalized 4-char prefix of the base segment: coarse enough
            # that near-dup variants land together ("Magnetar"/"Magnetars"
            # → "magn"), tight enough to bound the bucket join; LSH prunes
            # the collisions within a block
            F.substring(
                F.lower(F.regexp_replace(base_name(F.col("name")), r"[^A-Za-z0-9]", "")),
                1, 4,
            ),
        )
    )
    if max_bucket_size is not None and max_bucket_size > 0:
        import logging

        keys = ["block", "band", "band_key"]
        # bands is read by the size aggregation and both self-join sides —
        # one materialization instead of three signature re-derivations
        bands = bands.localCheckpoint(eager=True)
        over = (
            bands.groupBy(*keys).agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket_size)
            .select(*keys,
                    F.ceil(F.col("n") / max_bucket_size).alias("_nsplit"),
                    "n")
        )
        stats = over.agg(
            F.count("*").alias("k"), F.max("n").alias("mx"), F.sum("n").alias("tot")
        ).collect()[0]
        if stats["k"]:
            logging.getLogger(__name__).warning(
                "lsh_candidate_pairs: splitting %d oversized LSH bucket(s) "
                "(largest %d names > cap %d; %d names affected) — candidate "
                "pairs straddling a split are not generated, so an "
                "over-merged signature cluster may canonicalize as several "
                "entities; raise n_perms/rows_per_band or the cap to "
                "restore recall",
                stats["k"], stats["mx"], max_bucket_size, stats["tot"],
            )
            # the split table is one row per OVERSIZED bucket (≤ names/cap
            # rows) → broadcast; the sub-bucket id is a pure hash of the
            # name, so the split is deterministic and shuffle-free
            bands = (
                bands.join(F.broadcast(over.drop("n")), keys, "left")
                .withColumn(
                    "band_key",
                    F.when(
                        F.col("_nsplit").isNotNull(),
                        F.concat_ws(
                            "#", "band_key",
                            (md5_long("name") % F.col("_nsplit")).cast("string"),
                        ),
                    ).otherwise(F.col("band_key")),
                )
                .drop("_nsplit")
            )
    a = bands.select(F.col("name").alias("name_a"), "band", "band_key", "block")
    b = bands.select(F.col("name").alias("name_b"), "band", "band_key", "block")
    return (
        a.join(b, ["block", "band", "band_key"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )


def verified_pairs(names: DataFrame, n_perms: int = 16,
                   rows_per_band: int = 4, jaccard_min: float = 0.6,
                   shingle_k: int = 3,
                   lsh_max_bucket_size: int | None = None,
                   cached_out: list | None = None) -> DataFrame:
    """LSH candidates filtered by exact shingle Jaccard ≥ jaccard_min.
    ``lsh_max_bucket_size`` passes through to lsh_candidate_pairs'
    oversized-bucket split guard (default None = uncapped).

    The shingle table feeds FOUR consumers (the minhash signatures, both
    sides of the intersection join, the per-name sizes); when
    ``cached_out`` is given it is cached — one explode+distinct pass
    instead of four — and appended there for the caller to unpersist
    after its action (the same lifetime contract as
    canonicalize_triples' cached_out)."""
    sh = _shingle_names(names, shingle_k)
    if cached_out is not None:
        sh = sh.cache()
        cached_out.append(sh)
    cands = lsh_candidate_pairs(names, n_perms, rows_per_band, shingle_k,
                                max_bucket_size=lsh_max_bucket_size,
                                shingles=sh)
    sizes = sh.groupBy("name").agg(F.count("*").alias("n_sh"))
    inter = (
        cands.join(sh.select(F.col("name").alias("name_a"), "shingle"), "name_a")
        .join(sh.select(F.col("name").alias("name_b"), "shingle"), ["name_b", "shingle"], "left_semi")
        .groupBy("name_a", "name_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("name").alias("name_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("name").alias("name_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "name_a").join(nb, "name_b")
        .withColumn("jacc", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jacc") >= jaccard_min)
        .select("name_a", "name_b", F.round("jacc", 6).alias("jacc"))
    )


def propagate_min_labels(labels: DataFrame, edges: DataFrame,
                         max_iter: int = 10):
    """Synchronous min-label propagation to fixpoint over
    labels(name, label) / DIRECTED edges(name_a, name_b) (pass both
    directions for an undirected graph). → (labels, n_iters, converged);
    at the fixpoint each node's label is the minimum label reachable in
    its component.

    Diameter-bounded; components in the canonicalization use are tiny
    near-dup clusters so few iterations suffice. Each iteration references
    `labels` twice, so without lineage truncation the logical plan doubles
    per iteration (2^k copies → analyzer OOM by k≈10): localCheckpoint
    materializes and cuts the lineage every round. The did-it-change flag
    rides along in the propagation select, so the convergence check is a
    count over the already-checkpointed frame — not a second
    labels-vs-labels shuffle join per round. The property that the fold
    preserves the two-join check's semantics (same final labels, same
    exit iteration) is pinned by hypothesis in tests/test_canonicalize.py.
    """
    edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    changed = 0
    it = 0
    for it in range(1, max_iter + 1):
        neigh = (
            edges.join(labels.withColumnRenamed("name", "name_b"), "name_b")
            .groupBy("name_a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("name_a", "name")
        )
        new_labels = (
            labels.join(neigh, "name", "left")
            .select(
                "name",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    # max_iter < 1 runs no propagation round — convergence is UNKNOWN,
    # not established (matches the synchronous reference semantics the
    # hypothesis test encodes)
    return labels, it, changed == 0 and max_iter >= 1


def _union_find_labels(names: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact component-minimum labels for a SMALL verified-pair graph:
    collect the pairs, union-find with path compression on the driver,
    broadcast the (name → component-min name) map back onto the
    dictionary. Produces exactly the min-label-propagation fixpoint
    (each node labeled with the minimum name reachable in its
    component); names touching no pair map to themselves via the
    left-join coalesce, so only edge-endpoint names ride the broadcast."""
    spark = names.sparkSession
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in pairs.select("name_a", "name_b").collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    mapping = spark.createDataFrame(
        [(v, comp_min[find(v)]) for v in parent], "name string, label string"
    )
    return (
        names.select("name").distinct()
        .join(F.broadcast(mapping), "name", "left")
        .select("name", F.coalesce("label", "name").alias("label"))
    )


def canonical_entities(names: DataFrame, n_perms: int = 16,
                       rows_per_band: int = 4, jaccard_min: float = 0.6,
                       max_iter: int = 10, shingle_k: int = 3,
                       cache_names: bool = True,
                       driver_pairs_limit: int = 1_000_000,
                       lsh_max_bucket_size: int | None = None) -> DataFrame:
    """→ (name, entity_id, canonical_name): connected components of the
    verified similarity graph; entity_id = min member hash, canonical_name
    = lexicographically smallest member (deterministic).

    ``cache_names=False`` is for callers that already cached (and own
    the lifetime of) the dictionary — canonicalize_triples does, so it
    can unpersist it the moment the entity table is materialized.

    Components run on the driver when the verified-pair graph is small
    (≤ ``driver_pairs_limit`` pairs — the LSH-survivor set is vanishingly
    sparse relative to the dictionary, and 10^6 string pairs is tens of
    MB): one collect + union-find replaces k propagation rounds at two
    Spark jobs each, the same small-graph final phase the GraphX/
    GraphFrames connected-components implementations drop into. Above
    the limit — or with the limit set to 0 — the distributed
    min-label propagation runs; the two paths are pinned output-identical
    by tests/test_canonicalize.py."""
    # the dictionary feeds both the LSH pair derivation and the label
    # seed — cache it so the caller's upstream (often a distinct over a
    # corpus-scale stream) computes once per build, not per branch
    if cache_names:
        names = names.cache()
    # materialized once: the count-then-branch below and the chosen
    # components path both read it without re-running the LSH plan; the
    # shingle cache verified_pairs created is released right after
    _vp_caches: list = []
    pairs = verified_pairs(
        names, n_perms, rows_per_band, jaccard_min, shingle_k,
        lsh_max_bucket_size=lsh_max_bucket_size, cached_out=_vp_caches,
    ).localCheckpoint(eager=True)
    for c in _vp_caches:
        c.unpersist()

    if pairs.count() <= driver_pairs_limit and driver_pairs_limit > 0:
        labels, converged = _union_find_labels(names, pairs), True
    else:
        labels = names.select("name").distinct().withColumn("label", F.col("name"))
        edges = pairs.select("name_a", "name_b").unionByName(
            pairs.select(F.col("name_b").alias("name_a"), F.col("name_a").alias("name_b"))
        )
        labels, _, converged = propagate_min_labels(labels, edges, max_iter)
    if not converged:
        # no silent caps: a component with diameter > max_iter would keep
        # two canonical names for one cluster — make the truncation visible
        import logging

        logging.getLogger(__name__).warning(
            "canonical_entities: label propagation did not converge in %d "
            "iterations; clusters may be split",
            max_iter,
        )

    return labels.select(
        "name",
        md5_long(F.col("label")).alias("entity_id"),
        F.col("label").alias("canonical_name"),
    )
