"""Custom Python Data Source (Spark 4 DataSource API): the reference's
delimited raw-text format as a pluggable `spark.read.format(...)`
source (SURVEY.md §2.1 S1/S2 as a first-class connector, not just a
post-processing recipe).

The declarative path (`sources/text.read_delimited` — spark.read.text +
split expressions) remains the performance default: it runs in
whole-stage codegen. This source exists for the connector surface —
schema-aware options, file-level partition planning, and a pure-Python
reader that could wrap any format codec — the shape you'd use when the
input needs a real Python parsing library.

Partitioning: one InputPartition per file (each file is one reference
dump, parsed in parallel across executors). Ragged lines follow the
engine's overflow rule: extra fields rejoin into the last column,
missing fields are NULL.
"""

from __future__ import annotations

import os


def _parse_line(line: str, sep: str, n_fields: int) -> tuple:
    parts = line.split(sep)
    if len(parts) >= n_fields:
        head = parts[: n_fields - 1]
        head.append(sep.join(parts[n_fields - 1 :]))
        return tuple(head)
    return tuple(parts + [None] * (n_fields - len(parts)))


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _FilePartition(InputPartition):
        def __init__(self, file_path: str):
            self.file_path = file_path

    class DelimitedTextReader(DataSourceReader):
        def __init__(self, schema, options):
            self.schema = schema
            self.path = options.get("path")
            self.sep = options.get("sep", ":")
            self.n_fields = len(schema.fields)

        def partitions(self):
            if os.path.isdir(self.path):
                files = sorted(
                    os.path.join(self.path, f)
                    for f in os.listdir(self.path)
                    if not f.startswith((".", "_"))
                )
            else:
                files = [self.path]
            return [_FilePartition(f) for f in files]

        def read(self, partition):
            # errors="replace": invalid UTF-8 (legacy dumps, bit rot)
            # parses as U+FFFD like the declarative spark.read.text
            # path, instead of a strict-mode UnicodeDecodeError
            # killing the whole task (r11 fuzz finding)
            with open(
                partition.file_path, encoding="utf-8", errors="replace"
            ) as fh:
                for raw in fh:
                    line = raw.rstrip("\n")
                    if not line.strip():
                        continue
                    yield _parse_line(line, self.sep, self.n_fields)

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _PartCommit(WriterCommitMessage):
        def __init__(self, path: str, n_rows: int):
            self.path = path
            self.n_rows = n_rows

    class DelimitedTextWriter(DataSourceWriter):
        """Writer half of the connector: rows serialize back to the
        reference's sep-joined line format, one part file per input
        partition (executor-parallel, no shuffle). The overflow rule
        is the reader's inverse by construction — a sep inside the
        LAST column round-trips because the reader rejoins trailing
        fields into it. NULLs write as empty fields (the reader's
        missing-field rule reads short lines back as NULL)."""

        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            self.sep = options.get("sep", ":")
            self.overwrite = overwrite

        def write(self, iterator):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            fpath = os.path.join(self.path, f"part-{pid:05d}.txt")
            n = 0
            with open(fpath, "w", encoding="utf-8") as fh:
                for row in iterator:
                    vals = ["" if v is None else str(v) for v in row]
                    fh.write(self.sep.join(vals) + "\n")
                    n += 1
            return _PartCommit(fpath, n)

        def commit(self, messages):
            # task outputs are already in place; a production committer
            # would write to temp names here and rename on commit
            return None

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    class DelimitedTextStreamReader(SimpleDataSourceStreamReader):
        """File-tailing micro-batch reader over a directory of
        delimited dumps: the streaming half of the connector (Spark 4
        streaming Python Data Source API). Offsets are NAME-based, not
        positional (round-5 advisor finding): an offset records the
        last consumed basename plus the exact basenames of the batch it
        terminates. `read` consumes files lexicographically greater
        than `last` — new dumps land with later names (the reference's
        dated-dump convention) — so deleting an already-consumed dump
        (retention cleanup) can never shift indices into re-reads or
        skips, and `readBetweenOffsets` replays a committed range by
        its recorded basenames, raising loudly if any are missing
        rather than silently substituting neighbors. A late-arriving
        file that sorts BEFORE `last` violates the dated-dump contract
        and is deliberately ignored (the positional scheme would have
        corrupted the whole stream instead).

        Scale note: the *simple* stream reader parses on the driver by
        design (Spark prefetches and distributes the rows) — right for
        control-plane streams (new dump announcements, small reference
        tables), while bulk file streams belong to Spark's built-in
        file source whose per-batch work is partition-planned on
        executors. Same division as the batch half: connector surface
        here, codegen path (`sources/text.py`) for volume.
        """

        def __init__(self, schema, options):
            self.path = options.get("path")
            self.sep = options.get("sep", ":")
            self.n_fields = len(schema.fields)

        def _names(self) -> list[str]:
            return sorted(
                f
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )

        def initialOffset(self):
            return {"last": "", "batch": []}

        @staticmethod
        def _check_offset(off):
            """Reject pre-round-6 positional offsets ({"files": N})
            with a clear error instead of a KeyError('last') deep in
            read/readBetweenOffsets (ADVICE r6 #3). The positional
            scheme can't be translated safely: it counted a listing
            whose membership may have changed (retention deletions are
            exactly what it mis-handled), so the only sound recovery is
            a fresh checkpoint."""
            if "files" in off and "last" not in off:
                raise ValueError(
                    "incompatible checkpoint: offset uses the legacy "
                    "positional format {'files': N}; the knlp_delimited "
                    "stream now records name-based offsets and cannot "
                    "safely resume a positional checkpoint (the file "
                    "count no longer identifies which files were read). "
                    "Start the query with a fresh checkpointLocation."
                )
            return off

        def _parse(self, names):
            for name in names:
                # same decode hardening as the batch reader: U+FFFD,
                # not a task-killing UnicodeDecodeError
                with open(
                    os.path.join(self.path, name),
                    encoding="utf-8",
                    errors="replace",
                ) as fh:
                    for line in fh:
                        line = line.rstrip("\n")
                        if line:
                            yield _parse_line(line, self.sep, self.n_fields)

        def read(self, start):
            start = self._check_offset(start)
            fresh = [n for n in self._names() if n > start["last"]]
            last = fresh[-1] if fresh else start["last"]
            # list-iterator, not a generator: Spark's prefetch cache
            # copy.copy()s the iterator when a batch is re-served, and
            # generators aren't copyable
            return iter(list(self._parse(fresh))), {
                "last": last,
                "batch": fresh,
            }

        def readBetweenOffsets(self, start, end):
            end = self._check_offset(end)
            # Replay exactly the basenames the committed end offset
            # recorded. A missing file means committed data can no
            # longer be reproduced — fail loudly, never approximate.
            missing = [
                n
                for n in end["batch"]
                if not os.path.exists(os.path.join(self.path, n))
            ]
            if missing:
                raise FileNotFoundError(
                    f"cannot replay committed micro-batch: source files "
                    f"{missing} were deleted from {self.path} after being "
                    "committed but before the sink finished with them"
                )
            return iter(list(self._parse(end["batch"])))

    class DelimitedTextDataSource(DataSource):
        """Usage:
        spark.dataSource.register(DelimitedTextDataSource)
        (spark.read.format("knlp_delimited")
              .schema("korean string, hanjya string, examples string")
              .option("path", "/data/hanja.txt").option("sep", ":").load())
        df.write.format("knlp_delimited").mode("append")
          .option("path", out_dir).option("sep", ":").save()
        """

        @classmethod
        def name(cls) -> str:
            return "knlp_delimited"

        def reader(self, schema) -> DataSourceReader:
            return DelimitedTextReader(schema, self.options)

        def writer(self, schema, overwrite: bool) -> DataSourceWriter:
            return DelimitedTextWriter(self.options, overwrite)

        def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
            return DelimitedTextStreamReader(schema, self.options)

    DATASOURCE_AVAILABLE = True
except ImportError:  # Spark < 4: Python DataSource API absent
    DelimitedTextDataSource = None  # type: ignore[assignment]
    DATASOURCE_AVAILABLE = False


def register(spark) -> bool:
    """Register the custom source on a session; returns availability."""
    if not DATASOURCE_AVAILABLE:
        return False
    spark.dataSource.register(DelimitedTextDataSource)
    return True
