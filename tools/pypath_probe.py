"""Bisect the heavy-Arrow py-path step (round-10 open item).

Symptom (SCALE.md): after heavy-binary-Arrow families (mm_phash_dedup
+ mm_audio_dedup) or six stateful streams run, the fixed mapInPandas
canary permanently ~doubles for the rest of the session, while the
pure-JVM canary is flat. Ruled out in round 10 BY MEASUREMENT: Python
worker state (recycling doesn't recover it), direct-memory growth
(BufferPoolMXBean flat), Arrow volume per se (120 numeric mapInPandas
queries age nothing), pure-SQL streams.

This probe runs in a FRESH process:
  1. baseline py/jvm canaries + a JVM-side instrument census
  2. the trigger (selectable: mm, streams, phash, audio, synth-binary)
  3. canaries + census again
  4. recovery levers one at a time, re-measuring the canary after
     each: System.gc(), ContextCleaner drain, clearCache, a fresh
     child session, worker recycle (known no-op, kept as control)

Census fields are chosen to discriminate the live hypotheses:
  - JIT: total compilation time still rising? CodeCache pools near
    their max (JIT falls back to interpreter → permanent ~2×)?
  - threads: leaked state-store maintenance / python-runner threads
    (scheduler pressure on the 32-task single wave)?
  - fds/sockets of the JVM: leaked worker sockets slow each
    handshake (also explains why a daemon kill never recovers after
    mm ops — stuck ports)?
  - heap after System.gc(): live-set growth (broadcasts, state)?
  - listener bus: stopped streams leaving listeners that tax every
    job submission?

Usage: python tools/pypath_probe.py [mm|streams|phash|audio|synth N_MB|none]
Writes one JSON line per phase to stdout; human notes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def canaries(spark) -> dict:
    """The bench's fixed-work canaries: jvm (min-of-2) + py (min-of-2
    mapInPandas over 32 partitions — a single wave over the worker
    pool)."""
    def _py(pdfs):
        for pdf in pdfs:
            yield pdf.assign(v=(pdf["id"] * 2654435761 % 1000003))
    jvm = py = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 400_000_000, 1, 32) \
             .selectExpr("sum(xxhash64(id) % 1000000)").collect()
        jvm = min(jvm, time.time() - t0)
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 8_000_000, 1, 32) \
             .mapInPandas(_py, "id long, v long") \
             .selectExpr("sum(v)").collect()
        py = min(py, time.time() - t0)
    return {"jvm": round(jvm, 3), "py": round(py, 3),
            "load1": _load1()}


def census(spark) -> dict:
    """JVM-side instrument snapshot via py4j MXBeans (all read-only)."""
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict = {}
    out["threads"] = mf.getThreadMXBean().getThreadCount()
    out["threads_peak"] = mf.getThreadMXBean().getPeakThreadCount()
    comp = mf.getCompilationMXBean()
    out["jit_ms"] = comp.getTotalCompilationTime()
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            u = p.getUsage()
            out[f"pool:{name}"] = {
                "used_mb": round(u.getUsed() / 1e6, 1),
                "max_mb": round(u.getMax() / 1e6, 1)}
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = round(heap.getUsed() / 1e6, 1)
    for i in range(mf.getGarbageCollectorMXBeans().size()):
        g = mf.getGarbageCollectorMXBeans().get(i)
        out[f"gc:{g.getName()}"] = {"n": g.getCollectionCount(),
                                    "ms": g.getCollectionTime()}
    # direct buffers (round-10: flat; kept as the control reading)
    bufs = mf.getPlatformMXBeans(
        jvm.java.lang.Class.forName(
            "java.lang.management.BufferPoolMXBean"))
    for i in range(bufs.size()):
        b = bufs.get(i)
        out[f"buf:{b.getName()}_mb"] = round(b.getMemoryUsed() / 1e6, 1)
    # JVM process fds + socket census (worker channels leak?)
    jvm_pid = int(jvm.java.lang.ProcessHandle.current().pid())
    try:
        fds = os.listdir(f"/proc/{jvm_pid}/fd")
        out["fds"] = len(fds)
        socks = 0
        for fd in fds:
            try:
                if "socket:" in os.readlink(f"/proc/{jvm_pid}/fd/{fd}"):
                    socks += 1
            except OSError:
                pass
        out["fd_sockets"] = socks
    except OSError:
        out["fds"] = -1
    # python.daemon + worker processes under this JVM
    try:
        n_daemon = n_worker = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read().replace(b"\0", b" ").decode(
                        errors="replace")
            except OSError:
                continue
            if "pyspark.daemon" in cmd:
                n_daemon += 1
            elif "pyspark.worker" in cmd:
                n_worker += 1
        out["py_daemons"] = n_daemon
    except OSError:
        pass
    return out


def phase(tag: str, spark, extra: dict | None = None) -> None:
    row = {"phase": tag, **canaries(spark), "census": census(spark)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    c = row["census"]
    print(f"## {tag}: py {row['py']}s jvm {row['jvm']}s "
          f"load {row['load1']} threads {c['threads']} "
          f"fds {c['fds']} (sock {c.get('fd_sockets')}) "
          f"jit {c['jit_ms']}ms heap {c['heap_used_mb']}MB",
          file=sys.stderr, flush=True)


def run_trigger(spark, which: str) -> None:
    import __spark_entry__ as e
    qs = e.queries()

    def consume(df):
        df.write.mode("overwrite").format("noop").save()

    if which == "none":
        return
    if which in ("mm", "phash"):
        consume(qs["mm_phash_dedup"](spark, SF_DIR))
    if which in ("mm", "audio"):
        consume(qs["mm_audio_dedup"](spark, SF_DIR))
    if which == "streams":
        for name in ("stream_interval_join", "stream_interval_join_outer",
                     "stream_session_window", "stream_static_enrich",
                     "stream_cusum_alerts", "stream_dedup_watermarked"):
            consume(qs[name](spark, SF_DIR))
    if which.startswith("synth"):
        # synthetic binary Arrow round-trip: N MB per partition of
        # opaque bytes through mapInPandas, no catalog code involved
        mb = int(which.split()[1]) if " " in which else 8
        def gen(pdfs):
            import numpy as np
            import pandas as pd
            for pdf in pdfs:
                blob = np.random.RandomState(0).bytes(mb << 20)
                yield pd.DataFrame({
                    "id": pdf["id"],
                    "payload": [blob] * len(pdf)})
        def rd(pdfs):
            for pdf in pdfs:
                yield pdf[["id"]].assign(n=pdf["payload"].str.len())
        df = (spark.range(0, 64, 1, 32)
                   .mapInPandas(gen, "id long, payload binary")
                   .mapInPandas(rd, "id long, n long"))
        consume(df)


def main() -> int:
    which = " ".join(sys.argv[1:]) or "mm"
    from ethereum_export_pipeline_spark.session import get_spark
    spark = get_spark("pypath_probe")
    # warm: file listings + one mapInPandas so the pool exists
    from ethereum_export_pipeline_spark.sources.tables import (
        TESTDATA_TABLES, load_table)
    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).count()
    canaries(spark)  # throwaway warm-up

    phase("baseline", spark, {"trigger": which})
    t0 = time.time()
    run_trigger(spark, which)
    print(f"## trigger '{which}' ran in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    phase("after_trigger", spark)

    # ---- recovery levers, weakest→strongest, canary after each
    jvm = spark._jvm
    jvm.java.lang.System.gc()
    time.sleep(1)
    phase("after_system_gc", spark)

    # broadcast/RDD cleanup backlog: force the ContextCleaner by
    # dropping references then GC'ing again on the Python side too
    import gc as _pygc
    _pygc.collect()
    jvm.java.lang.System.gc()
    phase("after_double_gc", spark)

    spark.catalog.clearCache()
    phase("after_clear_cache", spark)

    from ethereum_export_pipeline_spark.session import (
        isolated_session, recycle_python_workers)
    killed = recycle_python_workers(spark)
    phase("after_worker_recycle", spark, {"killed": killed})

    child = isolated_session(spark)
    phase("fresh_child_session", child)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
