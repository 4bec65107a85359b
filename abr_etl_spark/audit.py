"""Plan auditor: the engine's .explain discipline as a tool.

    python -m abr_etl_spark.audit [query_key ...]

For each query in the driver contract, prints a one-line summary of the
physical-plan properties that matter at 100 TB: shuffle count, broadcast
vs sort-merge joins, scans with pushed filters, whole-stage-codegen
subtrees, and any Python-eval nodes (which should never appear in hot
paths). Exit code 1 if any audited query plans a Python eval node.
"""

from __future__ import annotations

import os
import sys


def audit_plan(spark, df) -> dict:
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    codegen = spark._jvm.PythonSQLUtils.explainString(qe, "codegen")
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "scans": plan.count("FileScan"),
        "pushed_filters": plan.count("PushedFilters: [")
        - plan.count("PushedFilters: []"),
        "codegen_subtrees": codegen.count("WholeStageCodegen subtree"),
        "python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
    }


# The sanctioned Python-in-the-loop plans: the Arrow-batched multimodal
# decode and frame sampler (operators/multimodal.py). Their mapInPandas
# nodes are expected -- and both queries are still oracle-verified (the
# stub byte math is replayed in DuckDB SQL). Any OTHER python-eval node
# still fails audit. (stream_running_counts' Python lives inside the
# streaming engine, not the returned batch plan, so it needs no entry.)
SANCTIONED_PYTHON = {"multimodal_features", "multimodal_frame_sample"}


def main(argv: list[str]) -> int:
    from abr_etl_spark.session import get_spark

    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("abr-etl-audit")
    qs = entry.queries()
    keys = argv or sorted(qs)
    bad = 0
    for key in keys:
        if key not in qs:
            print(f"{key}: UNKNOWN KEY")
            bad += 1
            continue
        try:
            info = audit_plan(spark, qs[key](spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            print(f"{key}: ERROR {exc}")
            bad += 1
            continue
        sanctioned = key in SANCTIONED_PYTHON
        if info["python_eval"] and sanctioned:
            flag = " python=sanctioned(arrow-mapInPandas)"
        elif info["python_eval"]:
            flag = " !PYTHON-IN-PLAN"
        else:
            flag = ""
        print(
            f"{key}: exch={info['exchanges']} bcast={info['broadcast_joins']} "
            f"smj={info['sort_merge_joins']} scans={info['scans']} "
            f"pushed={info['pushed_filters']} codegen={info['codegen_subtrees']}"
            f"{flag}"
        )
        bad += 1 if (info["python_eval"] and not sanctioned) else 0
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
