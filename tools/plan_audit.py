"""Catalog-wide physical-plan audit (optimization r11, guide §7.2).

For every declared query, prints one TSV row of plan-shape counters:

  name  n_exchange  n_reused_exchange  n_bhj  n_smj  n_shj  n_bnlj
  n_cartesian  n_python  n_generate  n_window  n_sort  plan_bytes

`n_python` counts BatchEvalPython / ArrowEvalPython / MapInPandas /
MapInArrow / FlatMapGroupsInPandas nodes (the engine's contract: only
the mm tier's MapInPandas decode stages may be non-zero).

Planning only — artifact memos referenced by a query ARE built (plan
build for consumers calls the memo getters), so run it on a warm
fixture dir. Output is a screening tool: a row with an unexpected
CartesianProduct / BatchEvalPython / exchange count is where to dig
with tools/dump_explain.py; absolute counts are fixture-scale plans
(AQE not yet applied).
"""

from __future__ import annotations

import os
import re
import sys

COUNTERS = {
    "n_exchange": r"(?<!Reused)Exchange",
    "n_reused_exchange": r"ReusedExchange",
    "n_bhj": r"BroadcastHashJoin",
    "n_smj": r"SortMergeJoin",
    "n_shj": r"ShuffledHashJoin",
    "n_bnlj": r"BroadcastNestedLoopJoin",
    "n_cartesian": r"CartesianProduct",
    "n_python": (r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                 r"|MapInArrow|FlatMapGroupsInPandas"),
    "n_generate": r"\bGenerate\b",
    "n_window": r"\bWindow\b",
    "n_sort": r"\bSort\b",
}


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ethereum_export_pipeline_spark.session import get_spark
    import __spark_entry__ as e

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_audit")
    qs = e.queries()
    names = sys.argv[1:] or sorted(qs)
    print("name\t" + "\t".join(COUNTERS) + "\tplan_bytes")
    for name in names:
        try:
            df = qs[name](spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # streaming rows plan at start() only
            print(f"{name}\tSKIP: {type(ex).__name__}")
            continue
        row = [str(len(re.findall(rx, txt))) for rx in COUNTERS.values()]
        print(f"{name}\t" + "\t".join(row) + f"\t{len(txt)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
