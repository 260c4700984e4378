"""JSONL interchange: lossless roundtrip, shard parallelism, corrupt-line
quarantine."""

from __future__ import annotations

from pathlib import Path

from downscaledclimatedata_spark.sources.jsonl import export_jsonl, import_jsonl
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

DOC_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")


def test_documents_roundtrip_lossless(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = load_table(spark, SF_SMOKE, "documents")
    export_jsonl(docs, out)
    back = import_jsonl(spark, out, DOC_SCHEMA).drop("_corrupt")
    want = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert got == want


def test_export_shards_for_parallel_read(spark, tmp_path):
    out = str(tmp_path / "sharded")
    docs = load_table(spark, SF_SMOKE, "documents").repartition(4)
    export_jsonl(docs, out)
    shards = [p for p in Path(out).glob("part-*") if p.is_file()]
    assert len(shards) == 4


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        'this is not json\n'
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n')
    df = import_jsonl(spark, str(src), DOC_SCHEMA + ", _corrupt string")
    rows = df.collect()
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt
