"""Custom Python DataSource: partition planning, filter pushdown
handshake, and end-to-end row parity with the original table."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from lakehouse_poc_spark.sources.pydatasource import (
    TsvCorpusReader,
    register_tsvcorpus,
)

SF = "/root/testdata/sf0.001"


def _write_tsv(spark, tmp_path, n_files=4):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_tsv")
    docs.select(
        F.concat_ws(
            "\t", F.col("doc_id").cast("string"), F.col("lang"), F.col("text")
        ).alias("value")
    ).repartition(n_files).write.mode("overwrite").text(path)
    return docs, path


def test_pushdown_consumes_lang_filters_only(tmp_path):
    reader = TsvCorpusReader({"path": str(tmp_path)})
    unsupported = list(
        reader.pushFilters(
            [
                EqualTo(("lang",), "en"),
                GreaterThan(("doc_id",), 5),
                EqualTo(("text",), "x"),
            ]
        )
    )
    assert reader.langs == {"en"}
    # everything we didn't claim comes back for Spark to evaluate
    assert unsupported == [GreaterThan(("doc_id",), 5), EqualTo(("text",), "x")]
    reader2 = TsvCorpusReader({"path": str(tmp_path)})
    assert list(reader2.pushFilters([In(("lang",), ("en", "de"))])) == []
    assert reader2.langs == {"en", "de"}


def test_one_partition_per_file_and_row_parity(spark, tmp_path):
    docs, path = _write_tsv(spark, tmp_path, n_files=4)
    reader = TsvCorpusReader({"path": path})
    assert len(reader.partitions()) == 4  # parallelism = file count
    register_tsvcorpus(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    back = spark.read.format("tsvcorpus").option("path", path).load()
    want = {
        (r.doc_id, r.lang, r.text)
        for r in docs.select("doc_id", "lang", "text").collect()
    }
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == want


def test_pushed_filter_matches_source_of_truth(spark, tmp_path):
    """The pushed lang predicate must not change results — compare the
    pushed-scan count against the parquet source of truth. (A
    pushFilters reader cannot run with pushdown disabled: Spark raises
    DATA_SOURCE_PUSHDOWN_DISABLED, so there is no unpushed twin.)"""
    docs, path = _write_tsv(spark, tmp_path)
    register_tsvcorpus(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    base = spark.read.format("tsvcorpus").option("path", path).load()
    pushed = base.filter(F.col("lang") == "en").count()
    want = docs.filter(F.col("lang") == "en").count()
    assert pushed == want and pushed > 0


def test_writer_commit_protocol_and_roundtrip(spark, tmp_path):
    """Two-phase commit: rows written via the custom writer land only
    through commit (temps renamed, _SUCCESS stamped with the row
    total); abort leaves the target untouched; roundtrip preserves
    rows; tabs in text are sanitized per the format contract."""
    from pathlib import Path

    from lakehouse_poc_spark.sources.pydatasource import (
        TsvCorpusWriter,
        register_tsvcorpus,
    )

    register_tsvcorpus(spark)
    out = tmp_path / "sink"
    out.mkdir()
    df = spark.createDataFrame(
        [(1, "en", "hello\tworld"), (2, "de", "hallo")],
        "doc_id long, lang string, text string",
    )
    df.repartition(2).write.format("tsvcorpus").option(
        "path", str(out)
    ).mode("append").save()
    assert (out / "_SUCCESS").read_text() == "2"
    assert not (out / "_temporary").exists()
    parts = sorted(out.glob("part-*.tsv"))
    assert len(parts) == 2
    back = (
        spark.read.format("tsvcorpus")
        .option("path", str(out))
        .option("glob", "part-*.tsv")
        .load()
    )
    rows = {r.doc_id: r for r in back.collect()}
    assert len(rows) == 2
    assert rows[1].text == "hello world"  # tab sanitized

    # abort: temps are removed, committed files untouched
    w = TsvCorpusWriter({"path": str(out)}, overwrite=False)

    class _FakeRow:
        def __init__(self, i):
            self.doc_id, self.lang, self.text = i, "en", "x"

    msg = w.write(iter([_FakeRow(9)]))
    assert Path(msg.temp).exists()
    w.abort([msg])
    assert not (out / "_temporary").exists()
    assert sorted(out.glob("part-*.tsv")) == parts  # nothing new published

    # overwrite mode replaces previously committed parts
    df2 = spark.createDataFrame(
        [(7, "fr", "bonjour")], "doc_id long, lang string, text string"
    )
    df2.coalesce(1).write.format("tsvcorpus").option("path", str(out)).mode(
        "overwrite"
    ).save()
    back2 = (
        spark.read.format("tsvcorpus")
        .option("path", str(out))
        .option("glob", "part-*.tsv")
        .load()
        .collect()
    )
    assert len(back2) == 1 and back2[0].doc_id == 7


def test_writer_append_twice_is_additive(spark, tmp_path):
    """A second append job must not clobber the first job's part files
    (final names are job-unique, not a 0-based index that collides),
    and _SUCCESS accumulates the total row count across appends."""
    from lakehouse_poc_spark.sources.pydatasource import register_tsvcorpus

    register_tsvcorpus(spark)
    out = tmp_path / "sink"
    out.mkdir()
    df1 = spark.createDataFrame(
        [(1, "en", "one"), (2, "en", "two")],
        "doc_id long, lang string, text string",
    )
    df2 = spark.createDataFrame(
        [(3, "de", "drei")], "doc_id long, lang string, text string"
    )
    for df in (df1, df2):
        df.coalesce(1).write.format("tsvcorpus").option(
            "path", str(out)
        ).mode("append").save()
    back = (
        spark.read.format("tsvcorpus")
        .option("path", str(out))
        .option("glob", "part-*.tsv")
        .load()
        .collect()
    )
    assert sorted(r.doc_id for r in back) == [1, 2, 3]
    assert len(list(out.glob("part-*.tsv"))) == 2  # one per job, no clobber
    assert (out / "_SUCCESS").read_text() == "3"
