"""``jsonl_sink`` — a custom Python DataSource WRITER (Spark 4
DataSource API), the write-side twin of the ``cdc_feed`` reader.

The reference's sink POSTs JSONEachRow batches to ClickHouse with
at-least-once semantics (internal/ingestion/clickhouse.go:62-132:
errors retry the whole batch; duplicates are left for the engine's
ReplacingMergeTree to fold, per SURVEY §3).  This sink shows the
Spark-idiomatic upgrade: the SAME wire format (one JSON object per
line) written under the two-phase task-commit protocol, which turns
at-least-once into exactly-once-per-job:

- each task writes its partition to a TEMP file (``.tmp-*``) and
  returns a :class:`WriterCommitMessage` naming it — nothing is
  visible mid-job;
- the driver's ``commit`` renames every temp into place and writes a
  ``_SUCCESS`` manifest listing the final files (readers key on the
  manifest, so partial jobs are never consumed);
- ``abort`` deletes the temps — a failed/speculated task or a failed
  job leaves NO visible output, the property the reference's
  retry-the-batch loop cannot give.

At 100 TB the identical protocol holds per task; renames are O(files)
metadata ops on any FileSystem/object-store committer.  Local fs here,
by design — the protocol, not the transport, is the operator.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

try:  # pragma: no cover - availability depends on the PySpark build
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    HAVE_DATASOURCE_WRITER_API = True
except ImportError:  # pragma: no cover
    HAVE_DATASOURCE_WRITER_API = False

if HAVE_DATASOURCE_WRITER_API:

    @dataclass
    class _FileCommit(WriterCommitMessage):
        tmp_path: str
        n_rows: int

    class JsonlSinkWriter(DataSourceWriter):
        """Per-task temp-file write; visibility deferred to commit."""

        def __init__(self, options, overwrite: bool = False):
            self.path = options.get("path")
            self.overwrite = overwrite
            if not self.path:
                raise ValueError("jsonl_sink requires option 'path'")

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return _FileCommit(tmp_path=tmp, n_rows=n)

        def _sweep_temps(self, keep: set[str]) -> None:
            # orphaned .tmp-* files (task attempts that died before
            # returning a commit message) are invisible to readers but
            # accumulate forever otherwise — sweep on both outcomes
            try:
                names = os.listdir(self.path)
            except FileNotFoundError:
                return
            for name in names:
                if name.startswith(".tmp-") and name.endswith(".jsonl"):
                    full = os.path.join(self.path, name)
                    if full not in keep:
                        try:
                            os.remove(full)
                        except FileNotFoundError:
                            pass

        def commit(self, messages):
            if self.overwrite:
                # honor SaveMode.Overwrite: drop every part file from
                # prior commits BEFORE renaming the new ones in, else a
                # smaller job leaves stale high-numbered parts behind
                # and any reader globbing part-*.jsonl (instead of
                # keying on the manifest) sees rows from the old run
                try:
                    for name in os.listdir(self.path):
                        if name.startswith("part-") and name.endswith(".jsonl"):
                            os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass
            # append mode must not clobber a prior job's part files:
            # start numbering after the highest existing index and fold
            # the previous manifest into the new one
            prior_files: list[str] = []
            prior_rows = 0
            base = 0
            if not self.overwrite:
                manifest = os.path.join(self.path, "_SUCCESS")
                if os.path.exists(manifest):
                    with open(manifest) as f:
                        prev = json.load(f)
                    prior_files = list(prev.get("files", []))
                    prior_rows = int(prev.get("rows", 0))
                existing = [
                    name
                    for name in os.listdir(self.path)
                    if name.startswith("part-") and name.endswith(".jsonl")
                ]
                if existing:
                    base = 1 + max(int(n[5:10]) for n in existing)
            final: list[str] = []
            total = 0
            for i, m in enumerate(messages):
                dst = os.path.join(self.path, f"part-{base + i:05d}.jsonl")
                os.replace(m.tmp_path, dst)
                final.append(os.path.basename(dst))
                total += m.n_rows
            self._sweep_temps(keep=set())
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                json.dump(
                    {"files": prior_files + final, "rows": prior_rows + total}, f
                )

        def abort(self, messages):
            for m in messages:
                try:
                    os.remove(m.tmp_path)
                except FileNotFoundError:
                    pass
            self._sweep_temps(keep=set())

    class JsonlSinkDataSource(DataSource):
        """``format("jsonl_sink")`` — option: path (output directory).

        Save modes: append (default) adds part files next to existing
        ones; overwrite clears prior ``part-*.jsonl`` at commit time so
        the directory reflects exactly this job's output."""

        @classmethod
        def name(cls):
            return "jsonl_sink"

        def writer(self, schema, overwrite):
            return JsonlSinkWriter(self.options, overwrite=bool(overwrite))


def register(spark) -> None:
    """Register the sink on this session (idempotent)."""
    if not HAVE_DATASOURCE_WRITER_API:
        raise RuntimeError("pyspark.sql.datasource API unavailable")
    spark.dataSource.register(JsonlSinkDataSource)
