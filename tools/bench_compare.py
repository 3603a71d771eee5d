"""Cross-round bench comparison with canary normalization.

Usage: python tools/bench_compare.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json
       (either side may be `git show <sha>:BENCH_FULL.json > /tmp/old.json`)

The last three verdicts each hand-derived the same analysis: raw
per-query deltas are dominated by HOST conditions (co-tenant load on a
shared kernel), so a delta only means something after dividing out the
machine-speed canary nearest to where the query ran. This tool does
that mechanically:

- Each sidecar carries `canary_trace` (per-25-query {i, jvm, py,
  load1} readings; round-10+). A query's position in `bench.HEADLINE`
  selects its nearest trace point; artifact rows and pre-trace
  sidecars fall back to the begin/end calibration fields.
- JVM-path families divide by the jvm canary ratio; Python-path
  families (mapInPandas-heavy: mm_*, stream_*) divide by the py
  canary ratio — round 10 showed the py canary amplifies host
  contention the JVM canary rides through, so using one global factor
  mis-attributes exactly the rows that matter.
- Output: every shared query with raw ratio, the local canary ratio,
  and the attributable ratio (raw / canary); rows whose attributable
  ratio leaves [1/T, T] are flagged ENGINE, rows whose raw ratio
  leaves it while attributable stays inside are flagged LOAD.
"""

from __future__ import annotations

import json
import os
import sys

#: Families whose hot path crosses the Python workers (Arrow
#: mapInPandas / applyInPandas / stateful streaming runners); all
#: other families are whole-stage-codegen JVM paths.
PY_PATH_PREFIXES = ("mm_", "stream_")

THRESHOLD = 1.25


def _headline_index() -> dict[str, int]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return {name: i for i, name in enumerate(bench.HEADLINE)}


def _canary_at(side: dict, idx: int | None, path: str) -> float:
    """The machine-speed factor (sec) for a row at loop position
    `idx` on the given path.

    jvm rows use the session-constant min of the begin/end
    calibrations (min-of-3 each): the per-trace jvm reading is a
    1-shot and flaps ±2× on its ~0.2 s duration — normalizing a
    sub-second query by it manufactures ×2 'regressions' out of
    nothing (seen on the r9→r10 dry run of this tool).

    py rows use the NEAREST trace reading (min-of-2 each): the py
    path genuinely drifts within a run (host contention amplified by
    the 32-worker single-wave max, plus the heavy-Arrow step), so a
    session constant would mis-attribute exactly the rows this tool
    exists for. Traceless sidecars (pre-round-10) fall back to the
    min of begin/end."""
    begin = side.get("calibration_sec" if path == "jvm"
                     else "py_calibration_sec")
    end = side.get("calibration_end_sec" if path == "jvm"
                   else "py_calibration_end_sec")
    const = min(v for v in (begin, end) if v is not None)
    trace = side.get("canary_trace") or []
    if path == "jvm" or idx is None or not trace:
        return const
    best = min(trace, key=lambda t: abs(t["i"] - idx))
    return best["py"]


def compare(old: dict, new: dict) -> list[dict]:
    pos = _headline_index()
    rows = []
    for name in sorted(set(old["queries"]) & set(new["queries"])):
        o, n = old["queries"][name], new["queries"][name]
        if o <= 0:
            continue
        idx = pos.get(name)  # None for artifact:* and retired queries
        path = ("py" if name.split(":")[-1].startswith(PY_PATH_PREFIXES)
                else "jvm")
        c_old = _canary_at(old, idx, path)
        c_new = _canary_at(new, idx, path)
        canary_ratio = (c_new / c_old) if c_old and c_new else 1.0
        raw = n / o
        attributable = raw / canary_ratio if canary_ratio else raw
        verdict = ""
        if attributable > THRESHOLD or attributable < 1 / THRESHOLD:
            verdict = "ENGINE"
        elif raw > THRESHOLD or raw < 1 / THRESHOLD:
            verdict = "LOAD"
        rows.append({"query": name, "old": o, "new": n,
                     "raw": round(raw, 2), "path": path,
                     "canary": round(canary_ratio, 2),
                     "attributable": round(attributable, 2),
                     "verdict": verdict})
    return rows


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__.strip().splitlines()[2].strip(), file=sys.stderr)
        return 2
    with open(argv[1]) as f:
        old = json.load(f)
    with open(argv[2]) as f:
        new = json.load(f)
    rows = compare(old, new)
    flagged = [r for r in rows if r["verdict"]]
    engine = [r for r in flagged if r["verdict"] == "ENGINE"]
    load = [r for r in flagged if r["verdict"] == "LOAD"]

    for tag, name in (("old", argv[1]), ("new", argv[2])):
        side = old if tag == "old" else new
        d = " DISCARD-STAMPED" if side.get("discard") else ""
        print(f"# {tag}: {name} total={side.get('value')}s "
              f"jvm={side.get('calibration_sec')}→"
              f"{side.get('calibration_end_sec')}s "
              f"py={side.get('py_calibration_sec')}→"
              f"{side.get('py_calibration_end_sec')}s "
              f"load={side.get('load1_begin')}→{side.get('load1_end')}"
              f"{d}")
    print(f"# shared queries: {len(rows)}; engine-attributable "
          f"|Δ|>{THRESHOLD - 1:.0%}: {len(engine)}; load-explained: "
          f"{len(load)}")
    for r in sorted(flagged, key=lambda r: -abs(r["attributable"] - 1)):
        print(f"{r['verdict']:<6} {r['query']:<34} {r['old']:>7.3f}s →"
              f" {r['new']:>7.3f}s raw ×{r['raw']:<5} canary(×"
              f"{r['canary']}, {r['path']}) → attributable ×"
              f"{r['attributable']}")
    tot = {"old_total": old.get("value"), "new_total": new.get("value"),
           "n_shared": len(rows), "n_engine": len(engine),
           "n_load": len(load)}
    print(json.dumps(tot))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
