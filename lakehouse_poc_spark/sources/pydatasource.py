"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partition-parallel reader for line-oriented ``id<TAB>lang<TAB>text``
corpus files, with filter pushdown.

Why this exists: the reference ingests bespoke blob formats by listing
files and parsing driver-side (SURVEY §2.1 S2/S3); the Spark-4-native
replacement is a declarative DataSource — the engine plans one input
partition PER FILE (so a 100 TB corpus of many files reads with full
cluster parallelism), and ``pushFilters`` lets the scan skip
non-matching rows inside the Python worker before they ever reach the
JVM (supported here: ``EqualTo``/``In`` on ``lang`` — the pattern a
real bespoke-format reader would use for any indexed/cheap predicate;
everything else is handed back to Spark).

Scale notes: Python data sources execute in Arrow-batched Python
workers — the right tool for formats the JVM cannot read, not a
replacement for parquet. State carried to executors is the option
dict + pushed filters (pickled), bounded; file listing happens once
at planning, on the driver, like any FileIndex.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TsvCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tsvcorpus: 'path' option is required")
        self.glob = options.get("glob", "part-*")
        self.langs: set[str] | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.langs = {f.value}
            elif isinstance(f, In) and f.attribute == ("lang",):
                self.langs = set(f.value)
            else:
                yield f  # not ours — Spark evaluates it post-scan

    def partitions(self):
        files = sorted(str(p) for p in Path(self.path).glob(self.glob))
        if not files:
            raise ValueError(
                f"tsvcorpus: no files matching {self.glob!r} under {self.path}"
            )
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                doc_id, lang, text = line.split("\t", 2)
                if self.langs is not None and lang not in self.langs:
                    continue
                yield int(doc_id), lang, text


class _PartMsg(WriterCommitMessage):
    def __init__(self, temp: str, rows: int):
        self.temp = temp
        self.rows = rows


class TsvCorpusWriter(DataSourceWriter):
    """Writer half of the bespoke format, implementing the Spark 4
    two-phase COMMIT PROTOCOL: each task writes to a private temp file
    under ``_temporary/`` and returns a :class:`WriterCommitMessage`;
    only the DRIVER-side ``commit`` (called when every task succeeded)
    renames temps into place and stamps ``_SUCCESS`` with the row
    total — so readers never observe a torn write, and a failed job
    leaves the target untouched (``abort`` removes the temps). The
    same job-commit discipline Spark's own FileCommitProtocol applies,
    expressed at the Python DataSource layer; temp and final dirs must
    share a filesystem (rename-based publish), as with any
    file-committing sink.

    Tabs/newlines in ``text`` are replaced with spaces — the
    line-oriented format cannot represent them (documented contract,
    same as the reader's split discipline).
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tsvcorpus: 'path' option is required")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        tmpdir = os.path.join(self.path, "_temporary")
        os.makedirs(tmpdir, exist_ok=True)
        temp = os.path.join(tmpdir, f"part-{uuid.uuid4().hex}.tsv.tmp")
        n = 0
        with open(temp, "w", encoding="utf-8") as fh:
            for row in iterator:
                text = (
                    (row.text or "")
                    .replace("\t", " ")
                    .replace("\n", " ")
                    .replace("\r", " ")
                )
                fh.write(f"{row.doc_id}\t{row.lang}\t{text}\n")
                n += 1
        return _PartMsg(temp=temp, rows=n)

    def commit(self, messages):
        import os
        import shutil as _sh
        import uuid

        if self.overwrite:
            for old in Path(self.path).glob("part-*"):
                old.unlink()
        # Final names must be unique PER JOB: a 0-based index would make
        # a second append job os.replace() over the first job's
        # part-00000.tsv and silently lose its rows. A job-unique token
        # in the name keeps appends additive; overwrite clears first.
        job = uuid.uuid4().hex[:12]
        total = 0
        prior = 0
        success = Path(self.path, "_SUCCESS")
        if not self.overwrite and success.exists():
            try:
                prior = int(success.read_text().strip() or 0)
            except ValueError:
                prior = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}-{job}.tsv")
            os.replace(m.temp, final)
            total += m.rows
        success.write_text(str(prior + total))
        _sh.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def abort(self, messages):
        import shutil as _sh

        _sh.rmtree(
            str(Path(self.path) / "_temporary"), ignore_errors=True
        )


class TsvCorpusDataSource(DataSource):
    """``spark.read.format("tsvcorpus").option("path", dir)`` /
    ``df.write.format("tsvcorpus").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "tsvcorpus"

    def schema(self) -> str:
        return "doc_id bigint, lang string, text string"

    def reader(self, schema):
        return TsvCorpusReader(self.options)

    def writer(self, schema, overwrite: bool):
        return TsvCorpusWriter(self.options, overwrite)


def register_tsvcorpus(spark) -> None:
    """Idempotent registration (re-registering overwrites, which is
    safe — the class is stateless). Also enables the Python-source
    filter-pushdown gate: a reader that implements ``pushFilters``
    REFUSES to plan while the conf is false (Spark 4 contract), so
    registration without it would hand every consumer a trap."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TsvCorpusDataSource)
