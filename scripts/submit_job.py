"""spark-submit entry point (BASELINE.json north rule launch mode).

The whole engine ships as one zip; the job script imports it from
``--py-files`` only — no repo checkout needed on driver or executors:

    ZIP=$(python -c "import sys; sys.path.insert(0, '<repo>'); \
          from gossiphs_spark.session import _package_zip; print(_package_zip())")
    spark-submit --master local[8] --py-files "$ZIP" \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.001 --out /tmp/out

On a real cluster only the launch line changes (``--master yarn|k8s://…``,
``--num-executors N`` vs ``4N`` for the scaling criterion); the job body
is identical — tests/test_cli.py::test_spark_submit_py_files runs this
exact script through a real spark-submit subprocess.

Jobs:
  triples  pages → Arrow-batched extraction → (subj, pred, obj) triples
           (the BASELINE.json throughput metric), written as parquet
  related  the flagship scored top-k neighbor query over the text corpus
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--job", default="related", choices=["triples", "related"])
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args()

    # session first, package imports after: the gossiphs_spark package is
    # resolved from the --py-files zip, proving the shipment path works
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"gossiphs_spark_{args.job}")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    t0 = time.time()

    if args.job == "triples":
        from pyspark.sql import functions as F

        from gossiphs_spark.operators.extract import extract_mentions
        from gossiphs_spark.sources.testdata import doc_pages

        pages = doc_pages(spark, args.sf_dir)
        m = extract_mentions(pages, columns=("url", "name", "kind", "start_byte"))
        titles = m.filter(F.col("kind") == "DEF").select(
            "url", F.col("name").alias("subj")
        )
        out = (
            m.filter(F.col("kind") != "DEF")
            .select("url", F.col("name").alias("obj"), F.col("kind").alias("pred"))
            .join(titles, "url")
            .select("subj", "pred", "obj", "url")
        )
    else:
        from gossiphs_spark.operators import textmode as tm
        from gossiphs_spark.sources.testdata import doc_pages
        from pyspark.sql import functions as F

        pages = doc_pages(spark, args.sf_dir)
        m = tm.filter_pointless(tm.mentions(pages), 3)
        defs = m.filter(F.col("kind") == "DEF")
        refs = m.filter(F.col("kind") == "REF")
        rel = tm.related_pages(tm.edges(defs, refs), defs)
        out = tm.topk_neighbors(rel, args.topk)

    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"job": args.job, "rows": n, "sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
