"""Multi-profile language identification (training-data pipeline op).

r1 shipped a single-profile threshold heuristic (tq_langid); this is the
real shape: per-language stopword profiles, score = stopword hit-ratio
per profile, guess = argmax (ties → lexicographically first profile,
zero hits → 'unk'). Scale shape: the profile dictionary is tiny and
broadcast; scoring is one explode + one map-side join + two aggregations
— no Python, no per-profile pass over the corpus.

Profiles are data, not code: callers can register any language by adding
(profile, word) rows. The built-ins carry English plus a deterministic
'rev' profile (reversed English stopwords) used by the test fixture to
prove multi-profile dispatch without external corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "on", "for", "with", "is")

PROFILES: dict[str, tuple[str, ...]] = {
    "en": EN_STOPWORDS,
    # reversed-English pseudo-language: deterministic second profile so a
    # single-language corpus can still exercise the argmax non-vacuously
    "rev": tuple(w[::-1] for w in EN_STOPWORDS),
}


def profile_dim(spark, profiles: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    rows = [
        (p, w) for p, ws in sorted((profiles or PROFILES).items()) for w in ws
    ]
    return spark.createDataFrame(rows, "profile string, w string")


def langid_argmax(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  profiles: DataFrame | None = None) -> DataFrame:
    """docs(id, text) → (id, guess, ratio): best-scoring profile per doc.

    ratio = stopword hits / total tokens, rounded to 6 (deterministic
    cross-engine ties); argmax ties break on profile name ascending;
    docs with zero hits in every profile guess 'unk' with ratio 0."""
    spark = docs.sparkSession
    dim = profiles if profiles is not None else profile_dim(spark)
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    totals = toks.groupBy(id_col).agg(F.count("*").alias("n_tok"))
    hits = (
        toks.join(F.broadcast(dim), "w")
        .groupBy(id_col, "profile")
        .agg(F.count("*").alias("n_hit"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ratio"), F.asc("profile"))
    best = (
        hits.join(totals, id_col)
        .withColumn("ratio", F.round(F.col("n_hit") / F.col("n_tok"), 6))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("profile").alias("guess"), "ratio")
    )
    return (
        docs.select(id_col).distinct()
        .join(best, id_col, "left")
        .fillna({"guess": "unk", "ratio": 0.0})
    )
