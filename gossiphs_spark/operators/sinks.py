"""S7 — wiki-link markdown export (SURVEY.md §2.1; ref src/main.rs:515-551).

The reference writes one Obsidian markdown file per source file whose body
is a list of ``[[wikilink]]``s to its related files. Demo-tier in the
reference and here; the Spark-idiomatic form is a partitioned text write:
one directory per page containing its markdown body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def markdown_links(related: DataFrame) -> DataFrame:
    """related(page, other, score) → (page, md) one markdown body per page,
    links sorted by score desc then name (deterministic)."""
    body = F.concat_ws(
        "\n",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("score")).alias("ns"), "other"))
            ),
            lambda x: F.concat(F.lit("- [["), x["other"], F.lit("]]")),
        ),
    )
    return related.groupBy("page").agg(body.alias("md"))


def write_markdown_vault(related: DataFrame, out_dir: str) -> None:
    md = markdown_links(related)
    (
        md.withColumn("dir", F.regexp_replace("page", "[^A-Za-z0-9._-]", "_"))
        .select("dir", "md")
        .write.mode("overwrite")
        .partitionBy("dir")
        .text(out_dir)
    )


# ---------------------------------------------------------------------------
# S9 analog — Neo4j BULK-IMPORT export (ref examples write per-row over the
# bolt driver, non-core; at 10^9+ edges the supported path is neo4j-admin
# database import). Format details that matter to the actual consumer:
#   * the header must appear EXACTLY ONCE — Spark's per-part headers would
#     be ingested as data rows by every file after the first, so data
#     parts are header-less and a one-line header file leads the list;
#   * quote escaping is doubled-quote ("" inside a quoted field) —
#     neo4j-admin's default — not Spark's default backslash style.
# ---------------------------------------------------------------------------
def write_neo4j_bulk(related: DataFrame, out_dir: str,
                     label: str = "Page", rel_type: str = "RELATED") -> None:
    """related(page, other, score) → header files + header-less CSV part
    directories loadable by::

        neo4j-admin database import full \
            --nodes=Page=nodes_header/part-.*,nodes/part-.* \
            --relationships=RELATED=rels_header/part-.*,rels/part-.*

    Node ids are the page urls (strings are valid :ID values); the
    relationship weight rides along as a typed property column."""
    from gossiphs_spark.operators.graphops import endpoints

    nodes = endpoints(related, "page", "other").select(
        F.col("node").alias("url:ID"), F.lit(label).alias(":LABEL")
    )
    rels = related.select(
        F.col("page").alias(":START_ID"),
        F.col("other").alias(":END_ID"),
        F.col("score").cast("long").alias("weight:long"),
        F.lit(rel_type).alias(":TYPE"),
    )
    opts = {"header": "false", "escape": '"'}  # doubled-quote escaping
    nodes.write.mode("overwrite").options(**opts).csv(f"{out_dir}/nodes")
    rels.write.mode("overwrite").options(**opts).csv(f"{out_dir}/rels")
    # header files go through the SAME writer so the whole export lands on
    # one filesystem (driver-local open() would strand them off-cluster
    # for an hdfs://… out_dir); neo4j-admin accepts a glob per file slot
    spark = related.sparkSession
    for name, header in (
        ("nodes_header", "url:ID,:LABEL"),
        ("rels_header", ":START_ID,:END_ID,weight:long,:TYPE"),
    ):
        (
            spark.createDataFrame([(header,)], "v string").coalesce(1)
            .write.mode("overwrite").text(f"{out_dir}/{name}")
        )
