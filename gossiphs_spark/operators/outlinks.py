"""U3/J3 — outlink resolution (SURVEY.md §2.3 J3, §2.9 U3).

Web form of the reference's import-path matching heuristics
(/root/reference/src/graph.rs:51-95): resolve each outlink string against
its page url, emit a canonical key, then link outlink↔page with an
EQUI-join on the canonical key — never a theta/cross join (the reference
runs its heuristic per candidate pair; at corpus scale that is quadratic,
so we normalize first and join second).

Resolution ladder (mirrors the reference's 3 steps):
  1. absolute http(s) url           → as-is (≅ package/absolute import)
  2. relative ./ ../ or bare path   → resolved against the page url's
                                      directory (≅ relative import)
  3. scheme-relative //host/path    → https: prefixed

The resolver is a vectorized pandas UDF (string-parsing loop Python-side,
Arrow-batched) — the residual fuzzy path the built-ins can't express.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def resolve_url(base: pd.Series, link: pd.Series) -> pd.Series:
    def one(b: str, l: str) -> str | None:
        if not isinstance(l, str):
            return None  # null (None or pandas NaN) — no link
        l = l.strip().strip("\"'<>")
        if not l:
            return None
        try:
            return urljoin(b or "", l)
        except ValueError:
            return None

    return pd.Series([one(b, l) for b, l in zip(base, link)])


def resolve_outlinks(imports: DataFrame) -> DataFrame:
    """imports(url, name=raw link) → (url, target) with canonical targets."""
    return imports.select(
        "url", resolve_url(F.col("url"), F.col("name")).alias("target")
    ).filter(F.col("target").isNotNull())


def link_outlinks_to_pages(imports: DataFrame, pages: DataFrame,
                           same_host_cap: int | None = 64) -> DataFrame:
    """J3 as an equi-join: outlink target == page url (exact), plus the
    same-host fallback as a second equi-join on registrable host —
    mirroring the reference's exact-then-package-suffix ladder.

    ``same_host_cap`` bounds the fallback's per-host destination set
    (deterministic: first N page urls per host in lexical order). The
    same-host signal is already weak — it says "somewhere on this site" —
    so capping it loses little, while WITHOUT the cap a hub host with H
    pages and U unmatched outlinks fans out H×U rows: one mega-host in a
    web corpus turns the fallback join quadratic. With the cap the
    worst case is ``same_host_cap × U`` — skew-safe at 100 TB. Pass
    ``None`` for the uncapped exact-reference semantics (r7 ADVICE:
    callers needing every same-host pair must be able to say so); the
    cap rule itself is oracle-paired by the j3_same_host_cap query on a
    fixture whose hosts EXCEED the cap."""
    from pyspark.sql import Window

    resolved = resolve_outlinks(imports)
    p = pages.select(F.col("url").alias("target")).distinct()
    exact = resolved.join(p, "target").select(
        F.col("url").alias("src_url"), F.col("target").alias("dst_url"),
        F.lit("exact").alias("match_kind"),
    )
    host = lambda c: F.regexp_extract(c, r"^[a-z]+://([^/]+)", 1)  # noqa: E731
    unmatched = resolved.join(p, "target", "left_anti")
    host_pages = (
        pages.select(F.col("url").alias("dst_url"))
        .withColumn("host", host(F.col("dst_url")))
        .distinct()
    )
    if same_host_cap is not None:
        # Two-phase top-N: ranking per host directly puts a mega-host's
        # ENTIRE page set in one window task — the cap computation
        # itself would become the skew bottleneck it exists to prevent.
        # Phase 1 ranks per (host, input partition), splitting a hot
        # host across tasks, and keeps <= cap rows per slice (the
        # host's true lexical top-cap is a subset of the union of
        # per-slice top-caps); phase 2 ranks the <= cap x n_partitions
        # survivors per host. Same rows as the single-phase rank,
        # per-task work bounded at every step.
        w1 = Window.partitionBy("host", "_p").orderBy("dst_url")
        w2 = Window.partitionBy("host").orderBy("dst_url")
        host_pages = (
            host_pages.withColumn("_p", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= same_host_cap)
            .drop("_rn", "_p")
            .withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= same_host_cap)
            .drop("_rn")
        )
    by_host = (
        unmatched.withColumn("host", host(F.col("target")))
        .filter(F.col("host") != "")
        .join(
            host_pages,
            "host",
        )
        .select(
            F.col("url").alias("src_url"), "dst_url",
            F.lit("same_host").alias("match_kind"),
        )
    )
    return exact.unionByName(by_host)
