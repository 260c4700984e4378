"""The corpusgen custom DataSource (Spark 4 Python DataSource API):
distributed generation, determinism, partition planning, and composition
with the corpus operators."""

from __future__ import annotations

import pytest

from downscaledclimatedata_spark.sources.corpusgen import (
    CorpusGenDataSource, CorpusGenReader, _doc_row)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(CorpusGenDataSource)
    return spark


def test_reads_requested_rows_with_documents_schema(registered):
    df = (registered.read.format("corpusgen")
          .option("n_docs", 200).option("n_partitions", 4).load())
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = df.collect()
    assert len(rows) == 200
    assert sorted(r["doc_id"] for r in rows) == list(range(200))
    assert df.rdd.getNumPartitions() == 4
    for r in rows[:5]:
        assert r["n_chars"] == len(r["text"])
        assert 10 <= len(r["text"].split()) <= 99


def test_deterministic_across_reads_and_seeds(registered):
    def read(seed):
        return {(r["doc_id"], r["text"]) for r in
                registered.read.format("corpusgen")
                .option("n_docs", 50).option("seed", seed).load().collect()}
    assert read("s1") == read("s1")        # same seed -> same corpus
    assert read("s1") != read("s2")        # new seed -> new corpus


def test_partition_planning_is_even():
    reader = CorpusGenReader({"n_docs": "103", "n_partitions": "4"})
    parts = reader.partitions()
    spans = [(p.start, p.end) for p in parts]
    assert spans == [(0, 26), (26, 52), (52, 78), (78, 103)]
    # contiguous, complete, no overlap
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_empty_corpus(registered):
    df = (registered.read.format("corpusgen")
          .option("n_docs", 0).load())
    assert df.count() == 0


def test_composes_with_corpus_operators(registered):
    """The generated relation must feed the real operators unchanged —
    a quality pass over a generated 300-doc corpus."""
    from downscaledclimatedata_spark.operators.prep import quality_filter
    df = (registered.read.format("corpusgen")
          .option("n_docs", 300).option("n_partitions", 8).load())
    out = quality_filter(df)
    n_pass = out.filter("passes").count()
    assert 0 < n_pass < 300  # the rule chain splits a generated corpus too


def test_row_function_is_pure():
    assert _doc_row("x", 7) == _doc_row("x", 7)
    assert _doc_row("x", 7) != _doc_row("x", 8)


def test_streaming_reader_drains_deterministically(registered, tmp_path):
    """readStream.format('corpusgen') must emit the SAME rows as the
    batch reader, in batch_docs-sized micro-batches, and stop advancing
    at max_docs."""
    import time
    got = []

    def sink(df, epoch_id):
        got.extend((r["doc_id"], r["text"]) for r in df.collect())

    q = (registered.readStream.format("corpusgen")
         .option("batch_docs", 40).option("max_docs", 100)
         .load().writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="0 seconds").start())
    deadline = time.time() + 90
    while time.time() < deadline and len(got) < 100:
        time.sleep(0.5)
    q.stop()
    assert sorted(r[0] for r in got) == list(range(100))
    batch = {(r["doc_id"], r["text"]) for r in
             registered.read.format("corpusgen")
             .option("n_docs", 100).load().collect()}
    assert set(got) == batch
