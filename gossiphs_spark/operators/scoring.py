"""Evidence-based link scoring (SURVEY.md §2.3 J5, §2.4 A3-A12, §2.5 W6).

Re-derivation of the reference's scoring loop (/root/reference/src/graph.rs:
532-798) as relational algebra. The reference runs a *sequential* driver
loop over every REF; each iteration only reads global tables, so the whole
thing is order-independent and factors into joins + window functions —
which is what makes it distributable.

Evidence model (web generalization of the file↔commit cupido graph):
    evidence(url, evidence_id, ts)  —  url was touched by crawl-evidence
    snapshot ``evidence_id`` at time ``ts``  (≅ file touched by commit).

Score formula (ref graph.rs:651-707):
    confidence = idf * jaccard
    score      = confidence * 10
                 (+100 if physical link) (+50 more if explicitly imported)
    score     /= sqrt(ref_count(def_url))      # complexity normalization
then entropy/z-score ambiguity pruning (ref graph.rs:710-739).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gossiphs_spark.functions import temporal_decay


# ---------------------------------------------------------------------------
# F8: fat-evidence filter (ref graph.rs:536-544): drop evidence touching
# >= floor(total_urls * ratio) urls. With ratio=1.0, "touches every page".
# ---------------------------------------------------------------------------
def valid_evidence(ev: DataFrame, total_urls: int, ratio: float = 1.0) -> DataFrame:
    limit = int(total_urls * ratio)  # usize cast truncation, ref graph.rs:542
    sizes = ev.groupBy("evidence_id").agg(F.countDistinct("url").alias("n_urls"))
    keep = sizes.filter(F.col("n_urls") < limit).select("evidence_id")
    return ev.join(F.broadcast(keep), "evidence_id", "left_semi")


# ---------------------------------------------------------------------------
# A12 + A4: decay anchor and decayed per-url cardinality (ref graph.rs:559-581).
# Anchor = max evidence ts (deterministic — never wall-clock).
# ---------------------------------------------------------------------------
def decayed_cardinality(ev: DataFrame, half_life_days: float = 365.0,
                        decay: bool = True) -> DataFrame:
    if not decay:
        return ev.groupBy("url").agg(F.countDistinct("evidence_id").cast("double").alias("card"))
    anchor = ev.agg(F.max("ts")).collect()[0][0]  # A12 — one scalar, not a data collect
    age_days = (F.lit(anchor).cast("timestamp").cast("double") - F.col("ts").cast("double")) / 86400.0
    per = ev.select("url", "evidence_id", temporal_decay(age_days, half_life_days).alias("w")).distinct()
    return per.groupBy("url").agg(F.sum("w").alias("card"))


# ---------------------------------------------------------------------------
# J5 + A5: co-occurrence intersection score per url pair — the skew hotspot.
# Self-join on evidence_id; AQE skew-join handles join-side skew, and F8
# has already removed the quadratic-blowup fat keys. ``probes`` optionally
# restricts the left side (the reference also only scores REF-side files
# that have evidence, graph.rs:618).
# ---------------------------------------------------------------------------
def pair_intersection(ev: DataFrame, half_life_days: float = 365.0,
                      decay: bool = True, probes: DataFrame | None = None) -> DataFrame:
    if decay:
        anchor = ev.agg(F.max("ts")).collect()[0][0]
        age_days = (F.lit(anchor).cast("timestamp").cast("double") - F.col("ts").cast("double")) / 86400.0
        ev = ev.select("url", "evidence_id", temporal_decay(age_days, half_life_days).alias("w"))
    else:
        ev = ev.select("url", "evidence_id", F.lit(1.0).alias("w"))
    a = ev.select(F.col("url").alias("url_a"), "evidence_id", "w")
    if probes is not None:
        a = a.join(F.broadcast(probes.select(F.col("url").alias("url_a"))), "url_a", "left_semi")
    b = ev.select(F.col("url").alias("url_b"), "evidence_id")
    return (
        a.join(b, "evidence_id")
        .filter(F.col("url_a") != F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.sum("w").alias("inter"))
    )


# ---------------------------------------------------------------------------
# A6: decayed Jaccard (ref graph.rs:679-687).
# ---------------------------------------------------------------------------
def jaccard(inter: DataFrame, card: DataFrame) -> DataFrame:
    ca = card.select(F.col("url").alias("url_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col("url").alias("url_b"), F.col("card").alias("card_b"))
    j = (
        inter.join(ca, "url_a").join(cb, "url_b")
        .withColumn("union_card", F.col("card_a") + F.col("card_b") - F.col("inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("union_card") > 0, F.col("inter") / F.col("union_card")).otherwise(F.lit(0.0)),
        )
    )
    return j.select("url_a", "url_b", "inter", "card_a", "card_b", "union_card", "jaccard")


# ---------------------------------------------------------------------------
# W6: entropy + z-score ambiguity pruning (ref graph.rs:710-739).
# Per REF group over its candidate scores:
#   penalty = exp(-entropy), entropy = -Σ p ln p, p = s/Σs
#   weak non-physical candidates (s < mean + 0.5σ, σ over population, and
#   count > 2) get ×0.1 first; then every candidate ×penalty.
# Only applies when the group has >1 candidate and Σs > 0 (ref graph.rs:710-713).
# ---------------------------------------------------------------------------
def entropy_zscore_adjust(scored: DataFrame, group_cols: list[str],
                          score_col: str = "score",
                          physical_col: str = "has_physical") -> DataFrame:
    wg = Window.partitionBy(*group_cols)
    s = F.col(score_col)
    # one withColumns batch: each withColumn() re-analyzes the whole plan
    df2 = scored.withColumns({
        "grp_sum": F.sum(s).over(wg),
        "grp_cnt": F.count("*").over(wg),
        "grp_mean": F.avg(s).over(wg),
        "grp_std": F.coalesce(F.stddev_pop(s).over(wg), F.lit(0.0)),
    })
    # guard the division: the reference only enters this branch when the
    # group sum is positive (ref graph.rs:712-713); ANSI mode would raise
    # DIVIDE_BY_ZERO otherwise
    p = s / F.col("grp_sum")
    ent_term = F.when(
        F.col("grp_sum") > 0,
        F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    df2 = df2.withColumn("entropy", F.sum(ent_term).over(wg))
    active = (F.col("grp_cnt") > 1) & (F.col("grp_sum") > 0)
    weak = (
        (~F.col(physical_col))
        & (F.col("grp_cnt") > 2)
        & (s < F.col("grp_mean") + 0.5 * F.col("grp_std"))
    )
    adjusted = F.when(
        active,
        F.when(weak, s * 0.1).otherwise(s) * F.exp(-F.col("entropy")),
    ).otherwise(s)
    return df2.withColumn(score_col, adjusted).drop(
        "grp_sum", "grp_cnt", "grp_mean", "grp_std", "entropy"
    )


# ---------------------------------------------------------------------------
# A11: complexity normalization divisor (ref graph.rs:599-604, 701-705).
# ---------------------------------------------------------------------------
def ref_counts(refs: DataFrame) -> DataFrame:
    return refs.groupBy("url").agg(F.count("*").alias("ref_count"))
