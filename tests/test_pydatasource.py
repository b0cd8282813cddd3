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
