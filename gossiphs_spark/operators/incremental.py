"""Incremental KG maintenance: splice a changed-page batch into the
materialized state and recompute related-pages ONLY for affected pages.

The reference rebuilds from scratch per run (its incremental surface is
the blob cache, /root/reference/src/cache.rs:14-59 — it caches
extraction, not graph state). At web scale a continuous crawl re-lands a
tiny fraction of pages per batch; rebuilding the full related table for
that is the single biggest waste in the pipeline. This module maintains
three materialized tables (mentions, per-name stats, related) and updates
them with joins whose size is bounded by the delta, not the corpus:

  affected names = names on the changed pages (old version ∪ new version)
    — any other name has identical mentions everywhere, so its global
    keep-status (F7), its edges, and its def-counts are all unchanged;
  affected pages = pages carrying an affected name, ∪ the changed pages
    — a page outside this set has no incident edge through an affected
    name and an unchanged def_count, so its related rows are unchanged
    (proof sketch: every edge names a DEF on its dst and a REF on its
    src; if either endpoint's mention set changed, the edge's name is on
    a changed page and therefore affected);
  recompute slice = mentions keyed by the names CARRIED BY affected
    pages (a superset of the affected names) — an affected page rebuilds
    ALL its related rows, including those through names the delta never
    touched, so the slice must carry its untouched-name edges too.

The F7 keep decisions need GLOBAL name existence — that is exactly what
the maintained per-name stats table provides, so the keep-filter of the
recompute slice never scans the corpus. tests/test_incremental.py proves
the spliced result equals a from-scratch rebuild, including names whose
keep-status flips in either direction.

Scale shape: every step is a join keyed on name or url against
delta-bounded tables; the only corpus-sized inputs are the maintained
tables themselves, read through name-/url-keyed semi-joins that prune to
the affected slice. No broadcasts of corpus-sized sides, no windows over
the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gossiphs_spark.operators import textmode as tm


def name_stats(m: DataFrame, symbol_len_limit: int = 3) -> DataFrame:
    """mentions → (name, n_defs, n_refs) over length-filtered rows — the
    materialized global-existence aggregate the F7 keep rules read."""
    return (
        m.filter(F.length("name") > symbol_len_limit)
        .groupBy("name")
        .agg(
            F.sum((F.col("kind") == "DEF").cast("long")).alias("n_defs"),
            F.sum((F.col("kind") == "REF").cast("long")).alias("n_refs"),
        )
    )


def _signed(stats: DataFrame, sign: int) -> DataFrame:
    return stats.select(
        "name",
        (F.col("n_defs") * sign).alias("n_defs"),
        (F.col("n_refs") * sign).alias("n_refs"),
    )


def update_name_stats(stats_old: DataFrame, old_slice: DataFrame,
                      new_slice: DataFrame,
                      symbol_len_limit: int = 3) -> DataFrame:
    """stats' = stats − contrib(old version of changed pages)
                      + contrib(new version); drop names that hit zero."""
    merged = (
        _signed(stats_old, 1)
        .unionByName(_signed(name_stats(old_slice, symbol_len_limit), -1))
        .unionByName(_signed(name_stats(new_slice, symbol_len_limit), 1))
        .groupBy("name")
        .agg(F.sum("n_defs").alias("n_defs"), F.sum("n_refs").alias("n_refs"))
        .filter((F.col("n_defs") > 0) | (F.col("n_refs") > 0))
    )
    return merged


def _kept(m: DataFrame, stats: DataFrame) -> DataFrame:
    """F7 keep rules evaluated against the maintained stats (no corpus
    scan): DEF kept iff the name has any REF globally, REF kept iff any
    DEF. Exact-name text-mode semantics (tm.filter_pointless twin)."""
    s = stats.select("name", "n_defs", "n_refs")
    joined = m.join(s, "name")
    return joined.filter(
        ((F.col("kind") == "DEF") & (F.col("n_refs") > 0))
        | ((F.col("kind") == "REF") & (F.col("n_defs") > 0))
    ).drop("n_defs", "n_refs")


def apply_delta(mentions_old: DataFrame, stats_old: DataFrame,
                related_old: DataFrame, changed_pages: DataFrame,
                symbol_len_limit: int = 3, return_touched: bool = False):
    """→ (mentions_new, stats_new, related_new, affected_pages) — plus a
    5th element when ``return_touched`` is set: ``{"urls": changed_urls,
    "names": affected_names}``, the exact key sets whose state-table rows
    can differ from the old state (mentions rows change only on changed
    urls; stats rows only for affected names; related rows only for
    affected pages). A bucketed state backend uses these to rewrite only
    the buckets the delta touched (streaming/maintain.py).

    ``changed_pages`` carries new/updated page rows (url, content,
    source); a page deletion is a changed page with empty content.

    Under ``return_touched`` the delta's mention table is eagerly
    local-checkpointed: the touched-key collects plus the three table
    writes would otherwise each re-run the extraction kernel on the
    batch. The severed lineage is fine on this path because recovery is
    the state store's versioned commit (replayed batches are skipped by
    id), not Spark recompute."""
    changed_urls = changed_pages.select("url").distinct()
    new_m = tm.mentions(changed_pages)
    if return_touched:
        new_m = new_m.localCheckpoint(eager=True)
    old_slice = mentions_old.join(changed_urls, "url", "left_semi")

    mentions_new = (
        mentions_old.join(changed_urls, "url", "left_anti").unionByName(new_m)
    )
    stats_new = update_name_stats(stats_old, old_slice, new_m, symbol_len_limit)

    lf = F.length("name") > symbol_len_limit
    affected_names = (
        old_slice.filter(lf).select("name")
        .unionByName(new_m.filter(lf).select("name"))
        .distinct()
    )
    m_len = mentions_new.filter(lf)
    affected_pages = (
        m_len.join(affected_names, "name", "left_semi").select("url")
        .unionByName(changed_urls)
        .distinct()
    )
    if return_touched:
        # delta-bounded set consumed by four joins plus a bucket-id
        # collect downstream — one computation instead of five
        affected_pages = affected_pages.localCheckpoint(eager=True)

    # recompute slice: affected pages rebuild their related rows from
    # scratch, so the slice needs every edge INCIDENT to an affected page
    # — including edges through names the delta never touched (an
    # affected page usually also carries unaffected names). Key the slice
    # by the names CARRIED BY affected pages, not by the delta's names:
    # keying by affected_names alone drops those untouched-name edges and
    # silently loses related rows (caught by live repro in review).
    relevant_names = (
        m_len.join(affected_pages, "url", "left_semi").select("name").distinct()
    )
    rel_m = _kept(m_len.join(relevant_names, "name", "left_semi"), stats_new)
    defs_e = rel_m.filter(F.col("kind") == "DEF")
    refs_e = rel_m.filter(F.col("kind") == "REF")
    # keep only edges INCIDENT to an affected page before the rollup: a
    # popular shared name also links unaffected-pair edges, whose rollup
    # groups would be aggregated and then discarded by the final
    # semi-join — pre-filtering bounds the aggregation by the delta
    # (every surviving related row has an affected endpoint as `page`)
    all_edges = tm.edges(defs_e, refs_e)
    aff_src = affected_pages.withColumnRenamed("url", "src_url")
    aff_dst = affected_pages.withColumnRenamed("url", "dst_url")
    # disjoint branches (src-affected ∪ dst-affected-but-src-not) cover
    # every incident edge exactly once — no dedup shuffle needed
    edges = all_edges.join(aff_src, "src_url", "left_semi").unionByName(
        all_edges.join(aff_dst, "dst_url", "left_semi")
        .join(aff_src, "src_url", "left_anti")
    )

    # def_count(page) must count ALL kept defs of an affected page — the
    # url-keyed slice, not the name-keyed one (an affected page may also
    # define unaffected names)
    defs_aff = _kept(
        m_len.join(affected_pages, "url", "left_semi"), stats_new
    ).filter(F.col("kind") == "DEF")

    rel_slice = tm.related_pages(edges, defs_aff).join(
        affected_pages.withColumnRenamed("url", "page"), "page", "left_semi"
    )
    related_new = (
        related_old.join(
            affected_pages.withColumnRenamed("url", "page"), "page", "left_anti"
        ).unionByName(rel_slice)
    )
    if return_touched:
        touched = {"urls": changed_urls, "names": affected_names}
        return mentions_new, stats_new, related_new, affected_pages, touched
    return mentions_new, stats_new, related_new, affected_pages
