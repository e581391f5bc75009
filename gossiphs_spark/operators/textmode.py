"""Text-mode KG stages over plain-text corpora (the `documents` table).

This is the SQL-expressible projection of the pipeline — every stage here
has a DuckDB oracle twin in ``__spark_entry__.py``. The html-mode pipeline
(operators/extract.py, Arrow UDF) shares the same downstream stages.

Extraction spec (deterministic, engine-portable):
  * tokens = split(content, ' '), 0-based position ``pos``
  * start_byte = sum(len+1 of preceding tokens)  [single-space separated]
  * kind = DEF on the token's first occurrence within the page, REF after
    (web analog of "definition vs usage"; ref src/symbol.rs:15-22)
  * canonical qualified entity = source || '.' || name for DEFs
    (analog of container-qualified names, ref src/extractor.rs:197-207)

Mirrors (all re-derived, none ported):
  build_global_symbol_table  ref src/graph.rs:300-368   -> defs/refs/idf
  filter_pointless_symbols   ref src/graph.rs:370-403   -> semi-join filter
  REF→DEF linking            ref src/graph.rs:620-645   -> equi-joins
  related_files rollup       ref src/api.rs:230-299     -> pair aggregation
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gossiphs_spark.functions import base_name


# ---------------------------------------------------------------------------
# U1 (text mode): tokenize → mentions.  Pure DataFrame ops: posexplode is a
# JVM-side generator, the byte offsets are a running window sum — no Python.
# ---------------------------------------------------------------------------
def mentions(pages: DataFrame) -> DataFrame:
    """pages(url, content, source) → mentions(url, name, kind, pos, start_byte, end_byte).

    DEF/REF split = first-occurrence-within-page (ref symbol.rs:15-22 analog);
    byte offsets are the per-row identity anchor (ref symbol.rs:130-132).
    """
    toks = pages.select(
        "url",
        "source",
        F.posexplode(F.split(F.col("content"), " ")).alias("pos", "name"),
    )

    # Running byte offset over ALL tokens (empties included — consecutive
    # separators still advance the offset by 1); empties drop only after.
    w_bytes = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = (
        toks.withColumn(
            "start_byte",
            (F.sum(F.length("name") + 1).over(w_bytes) - (F.length("name") + 1)).cast("long"),
        )
        .withColumn("end_byte", (F.col("start_byte") + F.length("name")).cast("long"))
        .filter(F.col("name") != "")
    )

    w_first = Window.partitionBy("url", "name")
    return toks.withColumn(
        "kind",
        F.when(F.col("pos") == F.min("pos").over(w_first), F.lit("DEF")).otherwise(
            F.lit("REF")
        ),
    ).select("url", "source", "name", "kind", "pos", "start_byte", "end_byte")


# ---------------------------------------------------------------------------
# F6 + F7: hygiene + pointless-symbol semi-joins (ref graph.rs:370-403).
# Explicit plan shape: Catalyst will not invent the semi-join reduction, we
# order it before the (much bigger) linking join on purpose (O2).
# ---------------------------------------------------------------------------
def filter_pointless(m: DataFrame, symbol_len_limit: int = 3) -> DataFrame:
    m = m.filter(F.length("name") > symbol_len_limit)  # F6, ref graph.rs:382-384
    defs = m.filter(F.col("kind") == "DEF")
    refs = m.filter(F.col("kind") == "REF")
    ref_names = refs.select("name").distinct()
    def_names = defs.select("name").distinct()
    # DEF kept iff some REF uses the name (exact or dotted-suffix);
    # REF kept iff some DEF matches (exact or by base name). Text-mode names
    # are dot-free so suffix==exact here; the html pipeline exercises the
    # dotted path (see linking.link_by_base_name).
    kept_defs = defs.join(ref_names, "name", "left_semi")
    kept_refs = refs.join(def_names, "name", "left_semi")
    return kept_defs.unionByName(kept_refs)


# ---------------------------------------------------------------------------
# A3: IDF per defined name over distinct defining pages (ref graph.rs:352-359)
#   idf = ln(total_pages / n_defining_pages) + 1.0
# Small output (one row per distinct name) → broadcast-joined downstream.
# ---------------------------------------------------------------------------
def idf(defs: DataFrame, total_pages: int) -> DataFrame:
    return defs.groupBy("name").agg(
        F.countDistinct("url").alias("df"),
        (F.log(F.lit(float(total_pages)) / F.countDistinct("url")) + F.lit(1.0)).alias(
            "idf"
        ),
    )


# ---------------------------------------------------------------------------
# Hub-entity damping: drop names defined in > max_def_ratio × total pages.
# The reference *declares* this knob (graph.rs:916-918 "treated as noise",
# default 0.1) but never wires it up; at web scale it is mandatory — a name
# defined in 10% of 10^12 pages would emit ~10^22 candidate pairs. The
# stoplist is tiny (distinct hot names) → broadcast anti-join.
# ---------------------------------------------------------------------------
def hub_stoplist(defs: DataFrame, total_pages: int, max_def_ratio: float = 1.0) -> DataFrame:
    # default 1.0 = damping OFF, matching PipelineConfig / the CLI
    # (reference parity — it declares the knob, never applies it); pass
    # ~0.1 at web scale
    limit = max(int(total_pages * max_def_ratio), 1)
    return (
        defs.groupBy("name")
        .agg(F.countDistinct("url").alias("df"))
        .filter(F.col("df") > limit)
        .select("name")
    )


def damp_hubs(m: DataFrame, stoplist: DataFrame) -> DataFrame:
    # the stoplist broadcast is corpus-size-safe, unlike the name
    # dictionaries: a hot name needs df > ratio·n_pages defining pages, and
    # Σ df ≤ n_pages · defs_per_page, so |stoplist| ≤ defs_per_page / ratio
    # — bounded by per-page fan-out, independent of corpus size.
    return m.join(F.broadcast(stoplist), "name", "left_anti")


# ---------------------------------------------------------------------------
# J1: REF→DEF exact-name linking join (ref graph.rs:627-632).
# ---------------------------------------------------------------------------
def link_exact(defs: DataFrame, refs: DataFrame) -> DataFrame:
    d = defs.select(F.col("url").alias("def_url"), "name")
    r = refs.select(F.col("url").alias("ref_url"), "name", "start_byte")
    return r.join(d, "name").filter(F.col("ref_url") != F.col("def_url"))


# ---------------------------------------------------------------------------
# J2: base-name fallback linking (ref graph.rs:634-645) — the blocking stage.
# DEF side carries qualified canonical names (source.name); REFs are plain
# surface forms; the join key is the qualified name's base segment.
# ---------------------------------------------------------------------------
def link_by_base_name(qualified_defs: DataFrame, refs: DataFrame) -> DataFrame:
    d = qualified_defs.select(
        F.col("url").alias("def_url"),
        F.col("qualified_name"),
        base_name(F.col("qualified_name")).alias("name"),
    )
    r = refs.select(F.col("ref_url"), "name")
    return r.join(d, "name").filter(F.col("ref_url") != F.col("def_url"))


# ---------------------------------------------------------------------------
# A8: edge materialization — one edge per (src page, dst page, name) with
# weight = number of REF occurrences (ref symbol.rs:231-241 accumulation).
# Salting note: groupBy on (src,dst,name) is pre-reduced map-side by Spark's
# partial aggregation; the hub-entity hot-key variant lives in
# operators/graphops.salted_sum.
# ---------------------------------------------------------------------------
def edges(defs: DataFrame, refs: DataFrame) -> DataFrame:
    ref_counts = refs.groupBy("url", "name").agg(F.count("*").alias("weight"))
    d = defs.select(F.col("url").alias("dst_url"), "name").distinct()
    return (
        ref_counts.select(F.col("url").alias("src_url"), "name", "weight")
        .join(d, "name")
        .filter(F.col("src_url") != F.col("dst_url"))
        .select("src_url", "dst_url", "name", F.col("weight").cast("long").alias("weight"))
    )


# ---------------------------------------------------------------------------
# A9: related-pages rollup (ref src/api.rs:230-299), computed for ALL pages
# at once (the relation2 bulk path, ref api.rs:363-447) instead of the
# reference's per-file rayon loop — one aggregation, no N× traversals.
#   incoming: edge (other→url): weight  → max(weight // def_count(url), 1)
#   outgoing: edge (url→other): weight  → raw
# Integer-division + floor-1 semantics preserved (ref api.rs:248).
# ---------------------------------------------------------------------------
def related_pages(edges_df: DataFrame, defs: DataFrame) -> DataFrame:
    def_counts = defs.groupBy("url").agg(F.count("*").alias("def_count"))

    incoming = (
        edges_df.join(def_counts, edges_df.dst_url == def_counts.url)
        .select(
            F.col("dst_url").alias("page"),
            F.col("src_url").alias("other"),
            F.greatest(
                F.floor(F.col("weight") / F.col("def_count")), F.lit(1)
            ).cast("long").alias("w"),
        )
    )
    outgoing = edges_df.select(
        F.col("src_url").alias("page"),
        F.col("dst_url").alias("other"),
        F.col("weight").alias("w"),
    )
    return (
        incoming.unionByName(outgoing)
        .groupBy("page", "other")
        .agg(F.sum("w").alias("score"))
        .filter(F.col("score") > 0)  # F10, ref main.rs:271-273
    )


# ---------------------------------------------------------------------------
# A9 + related_symbols: the nested "related and WHY" rollup (ref
# api.rs:108-126 RelatedFileContext, built api.rs:254-283). Each related
# pair carries the contributing symbols with their direction-adjusted
# weights (incoming: weight // def_count floored at 1; outgoing: raw), and
# the other page's def/ref counts — one aggregation tree, no per-file loop.
# ---------------------------------------------------------------------------
def related_with_symbols(edges_df: DataFrame, defs: DataFrame,
                         refs: DataFrame) -> DataFrame:
    """→ (page, other, score, symbols: array<struct<name,w>>, n_defs, n_refs)."""
    def_counts = defs.groupBy("url").agg(F.count("*").alias("def_count"))
    incoming = (
        edges_df.join(def_counts, edges_df.dst_url == def_counts.url)
        .select(
            F.col("dst_url").alias("page"),
            F.col("src_url").alias("other"),
            "name",
            F.greatest(
                F.floor(F.col("weight") / F.col("def_count")), F.lit(1)
            ).cast("long").alias("w"),
        )
    )
    outgoing = edges_df.select(
        F.col("src_url").alias("page"), F.col("dst_url").alias("other"),
        "name", F.col("weight").cast("long").alias("w"),
    )
    per_sym = (
        incoming.unionByName(outgoing)
        .groupBy("page", "other", "name")
        .agg(F.sum("w").alias("w"))
    )
    ostats = defs.select("url", F.lit("DEF").alias("kind")).unionByName(
        refs.select("url", F.lit("REF").alias("kind"))
    ).groupBy("url").agg(
        F.sum((F.col("kind") == "DEF").cast("long")).alias("n_defs"),
        F.sum((F.col("kind") == "REF").cast("long")).alias("n_refs"),
    )
    return (
        per_sym.groupBy("page", "other")
        .agg(
            F.sum("w").alias("score"),
            F.array_sort(F.collect_list(F.struct("name", "w"))).alias("symbols"),
        )
        .filter(F.col("score") > 0)  # F10, as in related_pages
        .join(ostats.withColumnRenamed("url", "other"), "other")
        .select("page", "other", "score", "symbols", "n_defs", "n_refs")
    )


# ---------------------------------------------------------------------------
# related_symbols(symbol) (ref api.rs:301-315): the symbol-level neighbor
# lookup — DEF → its linked references, REF → its linked definitions. In
# the name-keyed edge model both are slices of the edge table.
# ---------------------------------------------------------------------------
def symbol_neighbors(edges_df: DataFrame, name: str,
                     kind: str = "DEF") -> DataFrame:
    e = edges_df.filter(F.col("name") == name)
    if kind == "DEF":
        return e.select(
            F.col("dst_url").alias("def_url"),
            F.col("src_url").alias("neighbor_url"), "name", "weight",
        )
    return e.select(
        F.col("src_url").alias("ref_url"),
        F.col("dst_url").alias("neighbor_url"), "name", "weight",
    )


def edge_names(defs: DataFrame, refs: DataFrame) -> DataFrame:
    """The distinct names of :func:`edges`(defs, refs) WITHOUT
    materializing the join (per name the join emits |ref_pages| x
    |def_pages| rows — ~10^8 at sf0.1 — only to be key-projected).
    A name has an edge iff it has >= 1 ref page, >= 1 def page, and the
    two sets are not one single shared page (the src != dst filter):
    nd > 0 AND nr > 0 AND |ref_pages ∪ def_pages| > 1. Pinned equal to
    the join's key set by tests/test_textmode.py."""
    per_name = (
        defs.select("url", "name").distinct()
        .withColumn("kind", F.lit("D"))
        .unionByName(
            refs.select("url", "name").distinct().withColumn("kind", F.lit("R"))
        )
        .groupBy("name")
        .agg(
            F.countDistinct(F.when(F.col("kind") == "D", F.col("url"))).alias("nd"),
            F.countDistinct(F.when(F.col("kind") == "R", F.col("url"))).alias("nr"),
            F.countDistinct("url").alias("nu"),
        )
    )
    return per_name.filter(
        (F.col("nd") > 0) & (F.col("nr") > 0) & (F.col("nu") > 1)
    ).select("name")


def symbol_neighbors_many(edges_df: DataFrame, names_df: DataFrame) -> DataFrame:
    """Vectorized :func:`symbol_neighbors` over a probe-name table (ref
    api.rs:301-315, bulk form): per probed name, the DEF-direction rows
    (defining page ← its referencing pages) and REF-direction rows
    (referencing page → its defining pages). The probe table is a user
    query set (small) → broadcast semi-join, map-side."""
    e = edges_df.join(F.broadcast(names_df.select("name")), "name", "left_semi")
    as_def = e.select(
        F.lit("DEF").alias("kind"), F.col("dst_url").alias("anchor_url"),
        F.col("src_url").alias("neighbor_url"), "name", "weight",
    )
    as_ref = e.select(
        F.lit("REF").alias("kind"), F.col("src_url").alias("anchor_url"),
        F.col("dst_url").alias("neighbor_url"), "name", "weight",
    )
    return as_def.unionByName(as_ref)


# ---------------------------------------------------------------------------
# W8: top-k neighbors per page (ref api.rs:102-106).
# ---------------------------------------------------------------------------
def topk_neighbors(related: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("page").orderBy(F.desc("score"), F.asc("other"))
    return (
        related.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("page", "other", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# Triples: (subj = page head entity, pred='mentions', obj = distinct token)
# — the relation-extraction output contract (FIXTURES.md §3).
# ---------------------------------------------------------------------------
def triples(m: DataFrame, symbol_len_limit: int = 3) -> DataFrame:
    w_head = Window.partitionBy("url").orderBy("pos")
    heads = (
        m.withColumn("_rn", F.row_number().over(w_head))
        .filter(F.col("_rn") == 1)
        .select("url", F.col("name").alias("subj"))
    )
    objs = (
        m.filter(F.length("name") > symbol_len_limit)
        .groupBy("url", F.col("name").alias("obj"))
        .agg(F.min("start_byte").alias("start_byte"))
    )
    return (
        objs.join(heads, "url")
        .filter(F.col("obj") != F.col("subj"))
        .select("subj", F.lit("mentions").alias("pred"), "obj", "url", "start_byte")
    )


# ---------------------------------------------------------------------------
# J7: unique-def fallback (ref graph.rs:801-819): a DEF name defined in
# exactly one page and never linked gets every same-name REF attached.
# In set terms: unique defs ⋉ refs, anti-joined against already-linked defs.
# ---------------------------------------------------------------------------
def unique_def_fallback(defs: DataFrame, refs: DataFrame, linked: DataFrame) -> DataFrame:
    uniq = (
        defs.groupBy("name")
        .agg(F.countDistinct("url").alias("n"), F.min("url").alias("def_url"))
        .filter(F.col("n") == 1)
        .select("name", "def_url")
    )
    unlinked = uniq.join(
        linked.select("name").distinct(), "name", "left_anti"
    )
    r = refs.select(F.col("url").alias("ref_url"), "name")
    return r.join(unlinked, "name").select("name", "def_url", "ref_url").distinct()
