"""Capture before-plans for composed builds from a round-start worktree.

The old tree's _detach_graph/_detach_cached collect eagerly, so the
returned DataFrame's plan is a LocalTableScan; monkeypatching them to
identity in the capture session exposes the real computation plan.

Usage: python scripts/capture_plans_oldtree.py <old_tree> <tag> <suffix> q1,q2,...
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tree, tag, suffix, names = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4].split(","))
    sys.path.insert(0, tree)
    from gossiphs_spark.session import get_spark
    from gossiphs_spark.plans import queries as Q

    Q._detach_graph = lambda spark, df, g: df
    Q._detach_cached = lambda spark, df, cached: df
    if hasattr(Q, "_detach"):
        Q._detach = lambda spark, df: df
    if hasattr(Q, "_EXPLAIN_CAPTURE"):
        Q._EXPLAIN_CAPTURE = True
    spark = get_spark(app_name="capture_old")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = getattr(Q, name)(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
