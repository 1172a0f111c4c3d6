"""ZIP archives as a first-class Spark data source (PySpark 4 Python
DataSource API): ``spark.read.format("zipmembers").load(glob)``.

Same row contract as sources/ingest.zip_members (ZIP_MEMBER_SCHEMA:
zip_path, rel_path, length, content; reference app.py:121-137 member
scan), but expressed as a real DataSource instead of a
binaryFile+mapInPandas pipeline:

- **partition planning** happens once on the driver and is metadata-only
  (one InputPartition per archive file — the natural split unit, since
  ZIP central directories cannot be read in fragments);
- **reading** happens in executors; each task opens ONLY its own
  archive, streams members directly from the file (no whole-archive
  bytes column materialized in the scan, which the binaryFile path
  must), and Python's zipfile releases the GIL during inflate;
- downstream projections prune columns as with any DataFrame source.

At 100 TB the glob would come from a distributed listing (S2's
binaryFile inventory) — the partition-per-archive planning is unchanged;
a giant archive is the residual skew unit exactly as documented for the
mapInPandas path (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

ZIP_MEMBER_DDL = "zip_path string, rel_path string, length bigint, content binary"


def _iter_members(path: str):
    """Yield (zip_path, rel_path, length, content) rows of one archive —
    THE member-iteration contract, shared by the batch and streaming
    readers so normalization/ordering can never diverge between them."""
    import zipfile

    with zipfile.ZipFile(path) as zf:
        for info in sorted(zf.infolist(), key=lambda i: i.filename):
            if info.is_dir():
                continue
            name = info.filename.replace("\\", "/").removeprefix("./")
            yield (path, name, info.file_size, zf.read(info))


class ZipMembersDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(ZipMembersDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "zipmembers"

    def schema(self) -> str:
        return ZIP_MEMBER_DDL

    def reader(self, schema) -> "ZipMembersReader":
        return ZipMembersReader(self.options)

    def streamReader(self, schema) -> "ZipMembersStreamReader":
        return ZipMembersStreamReader(self.options)


class _ArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ZipMembersReader(DataSourceReader):
    def __init__(self, options):
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError("zipmembers source requires a path (file or glob)")

    def partitions(self):
        # driver-side metadata only: one partition per archive; the
        # listing itself is the cheap part (file names, no data)
        import glob as _glob

        paths = sorted(_glob.glob(self._glob))
        if not paths:
            raise FileNotFoundError(f"no archives match {self._glob}")
        return [_ArchivePartition(p) for p in paths]

    def read(self, partition: _ArchivePartition):
        # executor-side: stream members of exactly one archive
        yield from _iter_members(partition.path)


class ZipMembersStreamReader(DataSourceStreamReader):
    """Streaming flavor: archives ARRIVING in a directory are the
    micro-batch unit — the reference's 'new zip uploaded' ingest trigger
    as a Structured Streaming source.

    **Offset compaction** (ADVICE r03: the r03 offset carried every
    archive ever seen, O(total archives) forever). An offset is now

        {"cursor": [mtime_ns, path],            # high-water mark
         "recent": [[mtime_ns, path], ...]}     # within the grace window

    ``recent`` holds only archives whose mtime is within ``graceSeconds``
    (option, default 24 h) of the high-water mark, so steady-state offset
    size is O(arrivals per grace window), not O(stream lifetime). The
    contract this buys: an archive that first APPEARS with an mtime more
    than graceSeconds behind the newest file is assumed already ingested
    and is skipped — the same late-file bound as Spark's own
    FileStreamSource ``maxFileAge``. Cold start is a full backfill (the
    first latestOffset after initialOffset lists everything, regardless
    of age).

    **Restart/downtime bound, precisely.** latestOffset cannot see the
    committed offset (the Python DataSource API restores it only into
    partitions(start, end)), so the very first batch after a restart
    floors its window at (newest mtime - grace). From the SECOND batch
    on, the reader has observed ``start``'s cursor via partitions() and
    extends the floor down to it — files that landed during a long
    downtime are picked up one trigger later instead of lost. The
    residual miss is exactly maxFileAge's: a single availableNow run
    after downtime longer than the grace can skip files older than the
    grace; size graceSeconds to the longest tolerated outage.

    partitions(start, end) is a pure function of the two offset JSONs
    (set-difference on paths; legacy ``{"seen": [...]}`` offsets from
    pre-r04 checkpoints accepted on BOTH sides, so an upgrade replay of
    a legacy (start, end] still yields its archives), so replay from
    the checkpoint is deterministic; archives are immutable once
    written, so a replayed (start, end] yields identical rows —
    exactly-once at the sink. A transiently-empty directory listing
    re-issues the previous offset rather than an empty one (an empty
    END would wipe the done-set and re-ingest everything on the next
    diff). Member reads run in EXECUTORS (full DataSourceStreamReader,
    not the driver-side Simple variant)."""

    def __init__(self, options):
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError("zipmembers source requires a path (file or glob)")
        self._grace_ns = int(float(options.get("graceSeconds", 86400)) * 1e9)
        self._cold_start = False  # set by initialOffset (no checkpoint)
        self._floor_ns: int | None = None  # committed cursor seen via partitions()
        self._committed_paths: set = set()  # that offset's (processed) paths
        self._last_end = None  # last non-empty offset this instance returned

    def _snapshot(self):
        import glob as _glob
        import os

        out = []
        for p in sorted(_glob.glob(self._glob)):
            try:
                out.append((os.stat(p).st_mtime_ns, p))
            except OSError:
                continue  # listed then deleted: skip, never fail planning
        return out

    def initialOffset(self):
        # only called when NO checkpoint exists -> next latestOffset
        # must backfill the whole directory, whatever the file ages
        self._cold_start = True
        return {"cursor": None, "recent": []}

    def latestOffset(self):
        files = self._snapshot()
        if not files:
            # transient empty listing: repeat the previous offset so the
            # done-set survives (an empty END offset would make the next
            # diff re-ingest every archive still on disk)
            return self._last_end or {"cursor": None, "recent": []}
        cursor = max(files)
        if self._cold_start:
            recent = files  # one-time full backfill batch
            self._cold_start = False
        else:
            floor = cursor[0] - self._grace_ns
            recent = [f for f in files if f[0] >= floor]
            if self._floor_ns is not None and self._floor_ns < floor:
                # extend down to the last committed cursor observed via
                # partitions() — recovers files that arrived during a
                # downtime longer than the grace window — but EXCLUDE
                # the committed offset's own paths: those are processed,
                # and re-listing them in `recent` would make the next
                # diff re-ingest them (everything processed earlier than
                # the committed cursor has mtime below the extension, so
                # the committed paths are exactly the at-risk set)
                recent += [
                    f
                    for f in files
                    if self._floor_ns <= f[0] < floor
                    and f[1] not in self._committed_paths
                ]
                recent.sort()
        self._last_end = {
            "cursor": list(cursor),
            "recent": [list(f) for f in recent],
        }
        return self._last_end

    @staticmethod
    def _offset_paths(offset) -> set:
        if "seen" in offset:  # legacy pre-r04 full-list offset
            return set(offset["seen"])
        return {p for _, p in offset.get("recent", [])}

    def partitions(self, start, end):
        done = self._offset_paths(start)
        if "seen" in start:
            # legacy full-list offset: it enumerates everything ever
            # processed, so recovery can extend all the way down
            self._floor_ns, self._committed_paths = 0, done
        else:
            cur = start.get("cursor")
            if cur is not None:
                # remember the committed high-water mark + its paths for
                # the NEXT latestOffset's floor (docstring: restart bound)
                self._floor_ns, self._committed_paths = cur[0], done
        new = sorted(self._offset_paths(end) - done)
        return [_ArchivePartition(p) for p in new]

    def read(self, partition: _ArchivePartition):
        # executor-side: identical member contract as the batch reader
        yield from _iter_members(partition.path)

    def commit(self, end):
        # no source-side state to clean: processed-set membership lives
        # in the offsets themselves (cursor + grace window), so there is
        # nothing to prune here — the API requires the method to exist
        pass


def register_zip_source(spark) -> None:
    """Idempotent registration of the zipmembers format."""
    spark.dataSource.register(ZipMembersDataSource)
