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

    Offsets are the sorted set of archive paths seen so far (tiny,
    JSON-serialized into the checkpoint); a micro-batch's partitions are
    the newly-arrived archives, one InputPartition each, and member
    reads run in EXECUTORS (this is the full DataSourceStreamReader API,
    not the driver-side Simple variant — the scale path). Exactly-once
    comes from the engine replaying (start, end] partitions from the
    checkpoint on failure; archives are immutable once written, so a
    replay yields identical rows."""

    def __init__(self, options):
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError("zipmembers source requires a path (file or glob)")

    def _list(self):
        import glob as _glob

        return sorted(_glob.glob(self._glob))

    def initialOffset(self):
        return {"seen": []}

    def latestOffset(self):
        return {"seen": self._list()}

    def partitions(self, start, end):
        new = sorted(set(end["seen"]) - set(start.get("seen", [])))
        return [_ArchivePartition(p) for p in new]

    def read(self, partition: _ArchivePartition):
        # executor-side: identical member contract as the batch reader
        yield from _iter_members(partition.path)

    def commit(self, end):
        # source-side bookkeeping is the offset itself; nothing to prune
        pass


def register_zip_source(spark) -> None:
    """Idempotent registration of the zipmembers format."""
    spark.dataSource.register(ZipMembersDataSource)
