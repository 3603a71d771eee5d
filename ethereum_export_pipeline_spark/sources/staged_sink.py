"""Python Data Source WRITER: staged CSV export with an atomic
manifest commit — the reference's fleet export discipline (each
activity writes its own file, the run is only "done" when every range
landed; reference export_all.sh + the S3 staging step) expressed
through Spark 4's two-phase writer protocol:

  * executors (`write`) each land their partition into `_staging/`
    and return a commit message (path, row count) — NEVER visible to
    readers;
  * the driver (`commit`) renames every staged part into place and
    writes `_MANIFEST.json` (files + per-file and total row counts)
    LAST, so a reader that requires the manifest sees either the whole
    export or none of it;
  * `abort` removes the staged files — a failed run leaves no partial
    output.

This module targets a filesystem visible to driver and executors
(local mode here; on a cluster the same protocol runs against shared
storage — object stores want the rename swapped for a copy-or-
multipart finalize, which is exactly where this two-phase hook sits).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

FORMAT_NAME = "ethereum_staged_csv"
MANIFEST = "_MANIFEST.json"


def _csv_cell(v) -> str:
    if v is None:
        return ""
    s = str(v)
    if any(c in s for c in (",", '"', "\n")):
        s = '"' + s.replace('"', '""') + '"'
    return s


@dataclass
class _PartFile(WriterCommitMessage):
    staged: str
    final_name: str
    rows: int


class StagedCsvWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import uuid
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{FORMAT_NAME}: .save(path) is required")
        self.columns = schema.fieldNames()
        self.overwrite = overwrite
        # run-unique token baked into every final file name: appended
        # runs never collide with a prior run's parts, so append
        # accumulates instead of silently clobbering
        self.run_id = uuid.uuid4().hex[:8]

    # -------------------------------------------------- executor side
    def write(self, iterator) -> _PartFile:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{self.run_id}-{pid:08d}.csv"
        # staged name is ATTEMPT-unique: a speculative/retried attempt
        # writes its own file; only the committed attempt's message is
        # renamed into place, the loser's file dies with _staging
        staged = os.path.join(staging,
                              f"{name}.attempt-{ctx.taskAttemptId()}")
        n = 0
        with open(staged, "w") as f:
            f.write(",".join(self.columns) + "\n")
            for row in iterator:
                f.write(",".join(_csv_cell(v) for v in row) + "\n")
                n += 1
        return _PartFile(staged, name, n)

    # ---------------------------------------------------- driver side
    def commit(self, messages) -> None:
        prior: list[dict] = []
        if self.overwrite:
            for old in os.listdir(self.path):
                if old.endswith(".csv") or old == MANIFEST:
                    os.remove(os.path.join(self.path, old))
        else:
            try:
                prior = read_manifest(self.path)["files"]
            except FileNotFoundError:
                prior = []
        files = list(prior)
        for m in messages:
            os.replace(m.staged, os.path.join(self.path, m.final_name))
            files.append({"file": m.final_name, "rows": m.rows})
        files.sort(key=lambda d: d["file"])
        # reconcile the directory against the manifest: a run that
        # crashed BETWEEN renaming parts in and writing the manifest
        # leaves orphan CSVs no manifest lists — a plain directory read
        # (spark.read.csv(dest)) would double-count them forever. The
        # committed state is exactly the manifest's file list, so
        # anything else goes; after this, directory reads and
        # manifest-keyed reads agree.
        listed = {d["file"] for d in files}
        for name in os.listdir(self.path):
            if name.endswith(".csv") and name not in listed:
                os.remove(os.path.join(self.path, name))
        manifest = {"files": files,
                    "total_rows": sum(d["rows"] for d in files),
                    "columns": self.columns}
        # manifest lands LAST: readers keyed on it see all-or-nothing
        tmp = os.path.join(self.path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.path, MANIFEST))
        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)


class StagedCsvDataSource(DataSource):
    """`df.write.format("ethereum_staged_csv").save(dir)`."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool) -> StagedCsvWriter:
        return StagedCsvWriter(schema, self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(StagedCsvDataSource)


def read_manifest(path: str) -> dict:
    """Load the export manifest; raises if the export never committed
    (the all-or-nothing read contract)."""
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
