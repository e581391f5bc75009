"""sf1-scale spot-bench of the most expensive queries (r6 verdict item 7).

The heavy bench queries are datagen-fixture-driven, so "sf1" here means
the SAME operator pipelines at 10x their sf0.1 bench-fixture size,
parameterized only by a scale factor k in {1, 10}: a super-linear
blowup the fixed-size suite can't see shows up as
t(10x)/t(1x) >> rows(10x)/rows(1x).

Probe notes:
* kg_build_related / kg_triples_canonical / kg_delta_related reuse the
  exact operator compositions of plans/queries.py with the page count
  scaled (pages_df_dist so the corpus never materializes on the driver).
* kg_delta_related keeps the DELTA fixed (5 pages) while the corpus
  grows 10x — the incremental-maintenance contract is that splice cost
  tracks the delta, not the corpus, so its healthy ratio is ~flat for
  the splice plus ~linear for the shared base build.
* dd_embedding_neardup scales the number of CLUSTERS (16 -> 160 labels,
  n_centroids likewise), not cluster size: every same-label pair in the
  fixture is a true near-dup by construction, so growing cluster size
  would grow the TRUE OUTPUT quadratically — that is a property of the
  fixture, not of the blocking design being measured. More groups of
  constant size is also the realistic web-corpus shape.
* kg_build_scored is excluded by design: its 44-page fixture IS the
  query (the DuckDB twin's exact arithmetic depends on every page), so
  its cost is the ~30-stage DAG, constant in sf by construction.

Writes BENCH/sf1_spot_r07.json; paste the table into BENCH/NOTES_r07.md.
Usage: python scripts/sf1_spot_bench.py [k_hi=10]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

EMB_DIM = 64
EMB_ROWS_1X = 2000
EMB_LABELS_1X = 16


def probe_build_related(spark, k):
    from gossiphs_spark.config import PipelineConfig
    from gossiphs_spark.datagen import pages_df_dist
    from gossiphs_spark.plans.pipeline import build_graph

    pages, evidence = pages_df_dist(
        spark, n_pages=200 * k, seed=7, partitions=max(8, 4 * k))
    g = build_graph(spark, pages, evidence, PipelineConfig())
    return g.related


def probe_triples_canonical(spark, k):
    from gossiphs_spark.datagen import pages_df_dist
    from gossiphs_spark.operators.extract import extract_mentions
    from gossiphs_spark.plans.pipeline import canonicalize_triples

    pages, _ = pages_df_dist(
        spark, n_pages=120 * k, seed=7, partitions=max(8, 4 * k))
    m = extract_mentions(pages, columns=("url", "name", "kind", "start_byte"))
    titles = m.filter(F.col("kind") == "DEF").select(
        "url", F.col("name").alias("subj"))
    objs = (
        m.filter(F.col("kind").isin("REF", "IMPORT"))
        .groupBy("url", F.col("name").alias("obj"),
                 F.when(F.col("kind") == "REF", F.lit("mentions"))
                 .otherwise(F.lit("links_to")).alias("pred"))
        .agg(F.min("start_byte").alias("start_byte"))
    )
    triples = (
        objs.join(titles, "url").filter(F.col("obj") != F.col("subj"))
        .select("subj", "pred", "obj", "url", "start_byte")
    )
    return canonicalize_triples(triples)


def probe_delta_related(spark, k):
    from gossiphs_spark.operators import textmode as tm
    from gossiphs_spark.operators.incremental import apply_delta, name_stats

    g = (F.col("id") / 10).cast("long")
    mk = lambda suf: F.concat(F.lit("ent"), g.cast("string"), F.lit(suf))  # noqa: E731
    pages = spark.range(300 * k).select(
        F.concat(F.lit("doc://"), F.col("id").cast("string")).alias("url"),
        F.concat_ws(
            " ", mk("_alpha"), mk("_beta"), mk("_alpha"), mk("_gamma"),
            F.concat(F.lit("page"), F.col("id").cast("string"),
                     F.lit("_title")),
        ).alias("content"),
        F.lit("s").alias("source"),
    )
    m1 = tm.mentions(pages)
    fp = tm.filter_pointless(m1, 3)
    rel1 = tm.related_pages(
        tm.edges(fp.filter(F.col("kind") == "DEF"),
                 fp.filter(F.col("kind") == "REF")),
        fp.filter(F.col("kind") == "DEF"),
    )
    doc_num = F.regexp_extract("url", r"doc://(\d+)", 1).cast("long")
    changed = pages.filter(doc_num < 5).select(
        "url",
        F.concat(F.col("content"),
                 F.lit(" ent1_alpha ent1_beta")).alias("content"),
        "source",
    )
    _, _, related_new, _ = apply_delta(m1, name_stats(m1), rel1, changed)
    return related_new


def probe_embedding_neardup(spark, k):
    from gossiphs_spark.operators.ann import neardup_pairs

    n_rows, n_labels = EMB_ROWS_1X * k, EMB_LABELS_1X * k

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_v = []
            for i in ids:
                rng = np.random.default_rng(1000 + int(i))
                label = int(i) % n_labels
                crng = np.random.default_rng(77 + label)
                center = crng.choice([-1.0, 1.0], size=EMB_DIM)
                v = center + 0.5 * rng.uniform(-1, 1, EMB_DIM)
                out_v.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": ids, "v": out_v})

    emb = (spark.range(n_rows).repartition(max(8, 4 * k))
           .mapInPandas(gen, "vec_id long, v array<double>"))
    return neardup_pairs(emb, n_centroids=n_labels, threshold=0.6)


PROBES = {
    "kg_build_related": probe_build_related,
    "kg_triples_canonical": probe_triples_canonical,
    "kg_delta_related": probe_delta_related,
    "dd_embedding_neardup": probe_embedding_neardup,
}


def main() -> None:
    from gossiphs_spark.session import get_spark

    k_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    results: dict = {"k_hi": k_hi, "probes": {}}
    for name, fn in PROBES.items():
        rec = {}
        for k in (1, k_hi):
            # fresh session per measurement: no cross-probe cache reuse
            spark = get_spark(app_name=f"sf1spot_{name}_{k}", cores=32,
                              shuffle_partitions=32)
            t0 = time.perf_counter()
            n = fn(spark, k).count()
            dt = time.perf_counter() - t0
            rec[f"k{k}"] = {"sec": round(dt, 2), "rows": n}
            spark.stop()
            print(f"{name} k={k}: {dt:.1f}s rows={n}", flush=True)
        t_ratio = rec[f"k{k_hi}"]["sec"] / max(rec["k1"]["sec"], 1e-9)
        r_ratio = rec[f"k{k_hi}"]["rows"] / max(rec["k1"]["rows"], 1)
        rec["time_ratio"] = round(t_ratio, 2)
        rec["row_ratio"] = round(r_ratio, 2)
        results["probes"][name] = rec
        print(f"{name}: time x{t_ratio:.1f} rows x{r_ratio:.1f}", flush=True)
    with open(os.path.join(REPO, "BENCH", "sf1_spot_r07.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
