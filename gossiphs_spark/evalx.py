"""Evaluation harness (SURVEY.md §2.6 SO2/SO3, §2.4 A13, §2.3 J8).

Spark-side re-expression of the reference's eval stack
(/root/reference/eval/benchmark.py:224-253, eval/evaluate.py:236-296,
src/bin/aligner.rs:116-148): align a produced link/triple set with an
oracle set, report precision/recall, the false-negative set, and
score-bucketed quality stats — all as DataFrame ops (intersect/except/
pivot), no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = [(0, 10), (10, 50), (50, 100), (100, 500), (500, 1 << 62)]


def precision_recall(got: DataFrame, expected: DataFrame) -> dict:
    """SO2: |got ∩ expected| based P/R over identical-schema key sets."""
    g = got.distinct()
    e = expected.distinct()
    tp = g.intersect(e).count()
    n_got = g.count()
    n_exp = e.count()
    return {
        "tp": tp,
        "got": n_got,
        "expected": n_exp,
        "precision": tp / n_got if n_got else 0.0,
        "recall": tp / n_exp if n_exp else 0.0,
    }


def false_negatives(got: DataFrame, expected: DataFrame) -> DataFrame:
    """SO3: expected − got (ref analyze_fn.py:8-13)."""
    return expected.distinct().exceptAll(got.distinct())


def score_bucket_label(score_col) -> F.Column:
    expr = F.lit(None).cast("string")
    for lo, hi in reversed(BUCKETS):
        label = f"{lo}-{hi}" if hi < (1 << 62) else f"{lo}+"
        expr = F.when((score_col >= lo) & (score_col < hi), F.lit(label)).otherwise(expr)
    return expr


def bucketed_quality(links: DataFrame, oracle: DataFrame,
                     key_cols: list[str], score_col: str = "score") -> DataFrame:
    """A13: per score-bucket confirmed/phantom counts
    (ref eval/evaluate.py:236-296 buckets 0-10/10-50/50-100/100-500/500+)."""
    o = oracle.select(*key_cols).distinct().withColumn("_oracle", F.lit(1))
    labeled = (
        links.join(o, key_cols, "left")
        .withColumn("label", F.when(F.col("_oracle").isNotNull(), "confirmed").otherwise("phantom"))
        .withColumn("bucket", score_bucket_label(F.col(score_col)))
    )
    return labeled.groupBy("bucket").pivot("label", ["confirmed", "phantom"]).count().fillna(0)
