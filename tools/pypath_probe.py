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


def _proc_cpu(pid: int) -> float:
    """utime+stime of one process in seconds (clock ticks / 100)."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[-1].split()
        return (int(parts[11]) + int(parts[12])) / 100.0
    except (OSError, IndexError):
        return 0.0


def _py_procs() -> dict[int, str]:
    """pid → 'daemon'|'worker' for every pyspark process on the host."""
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd:
            out[int(pid)] = "daemon"
        elif "pyspark.worker" in cmd:
            out[int(pid)] = "worker"
    return out


def _cpu_split(spark) -> dict[str, float]:
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    cpus = {"jvm": _proc_cpu(jvm_pid), "daemon": 0.0, "worker": 0.0}
    for pid, kind in _py_procs().items():
        cpus[kind] += _proc_cpu(pid)
    return cpus


def canaries(spark) -> dict:
    """The bench's fixed-work canaries: jvm (min-of-2) + py (min-of-2
    mapInPandas over 32 partitions — a single wave over the worker
    pool). The py canary's LAST run is bracketed with /proc CPU
    accounting for the JVM, the pyspark daemons and the workers, so a
    wall-clock step decomposes into who-burned-it (or nobody — idle
    waits)."""
    def _py(pdfs):
        for pdf in pdfs:
            yield pdf.assign(v=(pdf["id"] * 2654435761 % 1000003))
    jvm = py = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 400_000_000, 1, 32) \
             .selectExpr("sum(xxhash64(id) % 1000000)").collect()
        jvm = min(jvm, time.time() - t0)
    cpu = {}
    for i in range(2):
        before = _cpu_split(spark)
        t0 = time.time()
        spark.range(0, 8_000_000, 1, 32) \
             .mapInPandas(_py, "id long, v long") \
             .selectExpr("sum(v)").collect()
        wall = time.time() - t0
        if wall < py:
            after = _cpu_split(spark)
            cpu = {f"cpu_{k}": round(after[k] - before[k], 2)
                   for k in after}
            cpu["cpu_wall"] = round(wall, 3)
        py = min(py, wall)
    return {"jvm": round(jvm, 3), "py": round(py, 3),
            "load1": _load1(), **cpu}


def path_canaries(spark) -> dict:
    """Per-path decomposition: the same fixed work through (a) a
    row-pickled BatchEvalPython UDF (no Arrow at all), (b) mapInArrow
    (Arrow transport, no pandas conversion), (c) applyInPandas with a
    groupBy (the stateful-ish grouped path). If the step shows on (a)
    the residue lives in the shared python-runner/socket machinery;
    only-(b/c) points at the Arrow writer/reader; pandas-only points
    at the conversion layer."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType
    out = {}

    plain = F.udf(lambda x: x * 2654435761 % 1000003, LongType())
    t = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 400_000, 1, 32) \
             .select(plain("id").alias("v")) \
             .selectExpr("sum(v)").collect()
        t = min(t, time.time() - t0)
    out["pickle_udf"] = round(t, 3)

    def _arrow(batches):
        for b in batches:
            yield b
    t = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 8_000_000, 1, 32) \
             .mapInArrow(_arrow, "id long") \
             .selectExpr("sum(id)").collect()
        t = min(t, time.time() - t0)
    out["map_in_arrow"] = round(t, 3)

    def _grouped(key, pdf):
        return pdf.head(1)[["id"]]
    t = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, 2_000_000, 1, 32) \
             .withColumn("g", (F.col("id") % 64).cast("long")) \
             .groupBy("g").applyInPandas(_grouped, "id long") \
             .selectExpr("sum(id)").collect()
        t = min(t, time.time() - t0)
    out["apply_in_pandas"] = round(t, 3)
    return out


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


def jfr_canary(spark, tag: str) -> str:
    """Run the py canary inside a JFR 'profile' recording; return the
    recording path. Parsed by `jfr_top_frames` to name exactly where
    the JVM burns its CPU before vs after the trigger."""
    import subprocess
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    jcmd = os.path.join(os.environ["JAVA_HOME"], "bin", "jcmd")
    path = f"/tmp/pypath_{tag}.jfr"
    subprocess.run([jcmd, str(jvm_pid), "JFR.start", f"name={tag}",
                    "settings=profile"], check=True, capture_output=True)

    def _py(pdfs):
        for pdf in pdfs:
            yield pdf.assign(v=(pdf["id"] * 2654435761 % 1000003))
    for _ in range(3):
        spark.range(0, 8_000_000, 1, 32) \
             .mapInPandas(_py, "id long, v long") \
             .selectExpr("sum(v)").collect()
    subprocess.run([jcmd, str(jvm_pid), "JFR.stop", f"name={tag}",
                    f"filename={path}"], check=True, capture_output=True)
    return path


def jfr_top_frames(path: str, n: int = 25) -> list[tuple[str, int]]:
    """Aggregate jdk.ExecutionSample leaf-ward frames (top 3 of each
    stack) from a JFR recording."""
    import collections
    import subprocess
    jfr = os.path.join(os.environ["JAVA_HOME"], "bin", "jfr")
    out = subprocess.run(
        [jfr, "print", "--events", "jdk.ExecutionSample", path],
        capture_output=True, text=True).stdout
    counts: collections.Counter = collections.Counter()
    in_stack = depth = 0
    for line in out.splitlines():
        s = line.strip()
        if s.startswith("stackTrace"):
            in_stack, depth = 1, 0
            continue
        if in_stack and s.startswith("at "):
            if depth < 3:
                frame = s[3:].split(" line:")[0].strip()
                counts[frame] += 1
                depth += 1
        elif in_stack and (s == "]" or s.startswith("}")):
            in_stack = 0
    return counts.most_common(n)


def phase(tag: str, spark, extra: dict | None = None,
          paths: bool = False) -> None:
    row = {"phase": tag, **canaries(spark), "census": census(spark)}
    if paths:
        row["paths"] = path_canaries(spark)
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    c = row["census"]
    print(f"## {tag}: py {row['py']}s jvm {row['jvm']}s "
          f"load {row['load1']} cpu(jvm {row.get('cpu_jvm')} wk "
          f"{row.get('cpu_worker')} dm {row.get('cpu_daemon')} wall "
          f"{row.get('cpu_wall')}) threads {c['threads']} "
          f"fds {c['fds']} (sock {c.get('fd_sockets')}) "
          f"jit {c['jit_ms']}ms heap {c['heap_used_mb']}MB"
          + (f" paths {row.get('paths')}" if paths else ""),
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

    use_jfr = os.environ.get("PROBE_JFR") == "1"
    phase("baseline", spark, {"trigger": which}, paths=True)
    if use_jfr:
        p0 = jfr_canary(spark, "baseline")
    t0 = time.time()
    run_trigger(spark, which)
    print(f"## trigger '{which}' ran in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    phase("after_trigger", spark, paths=True)
    if use_jfr:
        p1 = jfr_canary(spark, "after")
        for tag, p in (("baseline", p0), ("after", p1)):
            print(f"## JFR top frames [{tag}] ({p}):", file=sys.stderr)
            for frame, cnt in jfr_top_frames(p):
                print(f"##   {cnt:>6}  {frame}", file=sys.stderr)

    if os.environ.get("PROBE_LEVERS", "1") != "1":
        return 0

    # ---- recovery levers, weakest→strongest, canary after each
    jvm = spark._jvm
    jvm.java.lang.System.gc()
    time.sleep(1)
    phase("after_system_gc", spark)

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
