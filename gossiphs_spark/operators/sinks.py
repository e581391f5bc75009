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
# database import, which consumes CSVs with :ID/:START_ID/:END_ID/:TYPE
# headers). Spark writes those CSVs distributed — header conventions per
# the public neo4j-admin import format.
# ---------------------------------------------------------------------------
def write_neo4j_bulk(related: DataFrame, out_dir: str,
                     label: str = "Page", rel_type: str = "RELATED") -> None:
    """related(page, other, score) → ``{out_dir}/nodes`` + ``{out_dir}/rels``
    CSV directories loadable by::

        neo4j-admin database import full \
            --nodes=Page=nodes/part-*.csv --relationships=RELATED=rels/part-*.csv

    Node ids are the page urls (strings are valid :ID values); the
    relationship weight rides along as a typed property column."""
    nodes = (
        related.select(F.col("page").alias("url"))
        .unionByName(related.select(F.col("other").alias("url")))
        .distinct()
        .select(
            F.col("url").alias("url:ID"),
            F.lit(label).alias(":LABEL"),
        )
    )
    rels = related.select(
        F.col("page").alias(":START_ID"),
        F.col("other").alias(":END_ID"),
        F.col("score").cast("long").alias("weight:long"),
        F.lit(rel_type).alias(":TYPE"),
    )
    nodes.write.mode("overwrite").option("header", True).csv(f"{out_dir}/nodes")
    rels.write.mode("overwrite").option("header", True).csv(f"{out_dir}/rels")
