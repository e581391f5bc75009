"""F4 — namespace-depth pruning as a range-containment join
(SURVEY.md §2.2; ref /root/reference/src/graph.rs:154-199, depth calc
graph.rs:40-48).

The reference counts, per DEF, how many NAMESPACE ranges strictly enclose
its line and drops DEFs nested deeper than the language rule's
``namespace_filter_level``. Relationally that is an interval-containment
join mentions ⋈ namespaces on byte containment + a count aggregate.

The html extraction already excludes mentions inside boilerplate blocks
(cheaper — computed while the parse is in hand, like the reference does
per file); this operator is the standalone relational form for callers
whose extraction didn't, and for nested-section corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def namespace_depth(mentions: DataFrame, namespaces: DataFrame) -> DataFrame:
    """mentions × namespaces (same url) strict containment → depth per mention.

    Equi-join on url first (the partition key) so the interval predicate
    only runs within a page — never a cross join.
    """
    ns = namespaces.select(
        F.col("url"),
        F.col("start_byte").alias("ns_start"),
        F.col("end_byte").alias("ns_end"),
    )
    joined = mentions.join(ns, "url", "left").withColumn(
        "_inside",
        (
            F.col("ns_start").isNotNull()
            & (F.col("ns_start") < F.col("start_byte"))
            & (F.col("end_byte") < F.col("ns_end"))
        ).cast("long"),
    )
    group_cols = [c for c in mentions.columns]
    return joined.groupBy(*group_cols).agg(F.sum("_inside").alias("depth"))


def prune_by_namespace_depth(
    mentions: DataFrame, max_level: int = 0
) -> DataFrame:
    """Drop DEFs nested deeper than ``max_level`` enclosing NAMESPACE
    blocks and drop the NAMESPACE rows themselves (ref graph.rs:154-199)."""
    ns = mentions.filter(F.col("kind") == "NAMESPACE")
    rest = mentions.filter(F.col("kind") != "NAMESPACE")
    with_depth = namespace_depth(rest, ns)
    return with_depth.filter(
        (F.col("kind") != "DEF") | (F.col("depth") <= max_level)
    ).drop("depth")
