"""Small shared utilities (no Spark imports here)."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def scratch_dir(prefix: str = "spark_graft_") -> str:
    """A mkdtemp whose tree is removed at interpreter exit — catalog
    queries that materialize intermediate files (CSV/parquet round
    trips, staged stream dirs) must not leak /tmp across repeated
    oracle/bench runs."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def local_df(spark, rows, schema):
    """Small driver-side literal frame via the pandas/Arrow path.

    A plain-list ``createDataFrame`` becomes a pickled Python RDD
    split across defaultParallelism partitions; its first action
    spawns Python workers — measured ~4 s per frame on local[32] for
    a 65-row manifest, i.e. the whole cost of a bookmark commit. The
    pandas conversion goes through Arrow into a JVM-side local
    relation instead: no Python workers at execution, measured
    ~0.15 s. Falls back to the plain path when pandas is unavailable
    or conversion fails (e.g. exotic nested types)."""
    try:
        import pandas as pd
        if rows and not isinstance(rows[0], (list, tuple)):
            rows = [tuple(r) for r in rows]  # Row objects → tuples
        names = None
        if hasattr(schema, "fieldNames"):
            names = schema.fieldNames()
        elif isinstance(schema, str):
            names = [f.split()[0].strip("`")
                     for f in schema.split(",") if f.strip()]
        pdf = pd.DataFrame(rows, columns=names)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
