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
