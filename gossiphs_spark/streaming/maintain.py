"""Continuous KG maintenance: a live crawl keeps `related` fresh.

The batch splice operator (operators/incremental.py `apply_delta` —
splice ≡ rebuild pinned by tests/test_incremental.py) is the per-batch
kernel; this module is its Structured-Streaming driver: each micro-batch
of changed pages (new url, rewrite, or deletion-as-empty-content) is
spliced into a versioned materialized state of three tables
(mentions, per-name stats, related) with compute bounded by the delta,
not the corpus. The reference rebuilds from scratch per run (its
incremental surface is the extraction blob cache, ref cache.rs:14-59);
at web scale a crawl re-lands a tiny page fraction per trigger, and
this is the operator that turns that into a continuously-correct graph.

State backend (sandbox): parquet version directories plus an atomic
`_CURRENT.json` manifest swap — the same commit discipline as
lineage.ParquetRenameSink. A killed commit leaves the manifest pointing
at the previous complete version; a replayed micro-batch (foreachBatch
is at-least-once) is skipped by its recorded batch id, so the state is
effectively-exactly-once. The honest scale note: each commit REWRITES
the full state tables — the compute is delta-bounded but the sandbox
I/O is state-sized. The production exit is the same seam as
lineage.TripleSink: an Iceberg/Delta MERGE makes the I/O delta-bounded
too, with the manifest's role played by the table snapshot. The
checkpoint dir and the state dir are one deployment: reusing a state
dir with a FRESH stream checkpoint restarts batch ids and must start
from an empty state dir as well.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gossiphs_spark.operators import textmode as tm
from gossiphs_spark.operators.incremental import apply_delta, name_stats

_TABLES = ("mentions", "stats", "related")
_MANIFEST = "_CURRENT.json"


class RelatedStateStore:
    """Versioned parquet state with an atomic manifest pointer."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, _MANIFEST)

    def manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def load(self, spark: SparkSession):
        """→ (mentions, stats, related, last_batch_id) or None if empty."""
        man = self.manifest()
        if man is None:
            return None
        vdir = os.path.join(self.state_dir, man["version"])
        dfs = tuple(
            spark.read.parquet(os.path.join(vdir, t)) for t in _TABLES
        )
        return (*dfs, man["batch_id"])

    def commit(self, batch_id: int, mentions: DataFrame, stats: DataFrame,
               related: DataFrame) -> None:
        """Write a new version, swap the manifest, prune old versions.

        Write order is the atomicity argument: (1) all three tables land
        under a tmp dir no reader resolves, (2) os.replace publishes the
        version dir, (3) os.replace swaps the manifest — the only point
        a reader's view changes, (4) versions older than the previous
        one are pruned (the new version's parquet is self-contained, so
        only the current and its predecessor are kept, for debugging)."""
        version = f"v{batch_id:012d}"
        tmp = os.path.join(self.state_dir, f".inprogress_{version}")
        final = os.path.join(self.state_dir, version)
        shutil.rmtree(tmp, ignore_errors=True)
        for name, df in zip(_TABLES, (mentions, stats, related)):
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        man_tmp = self._manifest_path() + ".tmp"
        with open(man_tmp, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(man_tmp, self._manifest_path())
        keep = {version}
        prev = [
            d for d in sorted(os.listdir(self.state_dir))
            if d.startswith("v") and d not in keep
        ]
        for d in prev[:-1]:  # keep the immediate predecessor
            shutil.rmtree(os.path.join(self.state_dir, d),
                          ignore_errors=True)


def _empty_state(batch_df: DataFrame):
    """Schema-correct empty (mentions, stats, related) derived lazily
    from the batch itself — the bootstrap for a fresh state dir."""
    empty_pages = batch_df.limit(0)
    m0 = tm.mentions(empty_pages)
    s0 = name_stats(m0)
    d0 = m0.filter(F.col("kind") == "DEF")
    r0 = tm.related_pages(tm.edges(d0, m0.filter(F.col("kind") == "REF")), d0)
    return m0, s0, r0


def apply_batch(spark: SparkSession, store: RelatedStateStore,
                batch_df: DataFrame, batch_id: int,
                symbol_len_limit: int = 3) -> bool:
    """Splice one micro-batch into the store. Returns False for a
    replayed batch (id ≤ last committed — foreachBatch is at-least-once
    and this is the dedup that makes the state effectively-exactly-once)."""
    state = store.load(spark)
    if state is None:
        m_old, s_old, r_old = _empty_state(batch_df)
    else:
        m_old, s_old, r_old, last_id = state
        if batch_id <= last_id:
            return False
    m_new, s_new, r_new, _ = apply_delta(
        m_old, s_old, r_old, batch_df, symbol_len_limit)
    store.commit(batch_id, m_new, s_new, r_new)
    return True


def maintain_related_stream(spark: SparkSession, pages_dir: str, schema: str,
                            state_dir: str, checkpoint_dir: str,
                            max_files_per_trigger: int = 1,
                            symbol_len_limit: int = 3):
    """readStream over a landing dir of page batches → per-micro-batch
    splice into a RelatedStateStore. Returns (query, store); the query
    runs with availableNow (drain-then-stop — swap for a processing-time
    trigger on a live deployment)."""
    store = RelatedStateStore(state_dir)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    q = (
        src.writeStream
        .foreachBatch(lambda df, bid: apply_batch(
            spark, store, df, bid, symbol_len_limit))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, store
