"""Physical-plan audit tooling.

Catalyst owns optimization (SURVEY §4: pushdown, pruning, join selection, AQE
are built-in) — this module's job is to *verify* each declared query actually
gets the plan we want at scale: filters pushed to the parquet scan, pruned
ReadSchema, broadcast joins for dims, wide WholeStageCodegen spans, and no
row-at-a-time Python in hot paths that should be JVM-side.

Run ad hoc:  python -m eviction_lab_etl_spark.plans.audit [sf_dir] [name ...]
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def audit_plan(df: DataFrame, execute: bool = False) -> dict:
    """Extract scale-relevant facts from a DataFrame's formatted physical plan.

    Under AQE the pre-execution plan is provisional (``isFinalPlan=false``) and
    carries no codegen annotations; pass ``execute=True`` to run the query first
    so the audit sees the final adaptive plan with ``[codegen id : N]`` marks.
    """
    if execute:
        df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    # "formatted" output lists every node twice (tree + details section):
    # count only numbered tree nodes "(N) OperatorName" so counts are exact.
    tree_nodes = re.findall(r"^\s*[:+\-* ]*\((\d+)\) ([A-Za-z]+)", plan, re.M)
    ops = [op for _, op in tree_nodes]
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schema": re.findall(r"ReadSchema: ([^\n]*)", plan),
        "broadcast_joins": ops.count("BroadcastHashJoin"),
        # Non-equi broadcast joins (e.g. the kNN probe × corpus product) plan
        # as BroadcastNestedLoopJoin — still the small-side-broadcast strategy.
        "broadcast_nl_joins": ops.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": ops.count("SortMergeJoin"),
        "shuffles": ops.count("Exchange"),
        "codegen_stages": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "python_rows": ops.count("BatchEvalPython"),
        # Spark 4.x Arrow-boundary node names: ArrowEvalPython (pandas scalar),
        # ArrowAggregatePython (grouped-agg), FlatMapGroupsInPandas /
        # ArrowGroupedMapPython (applyInPandas), MapInPandas / PythonMapInArrow.
        "arrow_python": sum(
            1 for o in ops if ("Arrow" in o or "Pandas" in o) and o != "BatchEvalPython"
        ),
        "plan": plan,
    }


def audit_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from eviction_lab_etl_spark import registry

    registry.load_all_operators()
    out = {}
    for name in names or sorted(registry.QUERIES):
        if name.startswith(("io_", "stream_watermark", "stream_dedup", "stream_foreachbatch")):
            continue  # side-effecting sinks: skip in plan audit
        try:
            out[name] = audit_plan(registry.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - diagnostic tool
            out[name] = {"error": str(exc)}
    return out


if __name__ == "__main__":  # pragma: no cover
    import json
    import sys

    from eviction_lab_etl_spark.session import build_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = build_session(master="local[4]", shuffle_partitions=8)
    report = audit_all(spark, sf, names)
    for name, info in report.items():
        info.pop("plan", None)
        print(name, json.dumps(info))
