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
