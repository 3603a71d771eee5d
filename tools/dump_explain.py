"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/dump_explain.py OUTDIR SUFFIX <query ...>
Writes OUTDIR/<query>_<SUFFIX>.txt. Planning only — no job runs
(artifact memos referenced by a query ARE built, because plan build
for consumers calls the memo getters)."""

from __future__ import annotations

import os
import sys


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ethereum_export_pipeline_spark.session import get_spark
    import __spark_entry__ as e

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_explain")
    qs = e.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
