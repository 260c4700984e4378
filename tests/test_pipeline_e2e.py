"""End-to-end corpus build: raw documents -> written training shards,
every stage the oracle-checked operator, stage counts monotone, output
readable in the seeded order."""

from __future__ import annotations

import glob

from downscaledclimatedata_spark.operators.prep import quality_filter
from downscaledclimatedata_spark.pipeline import build_training_corpus
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_build_training_corpus_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    res = build_training_corpus(docs, out, budget_tokens=5_000, n_shards=4)

    assert res.n_input == docs.count()
    n_quality = quality_filter(docs).filter("passes").count()
    assert res.n_quality_pass == n_quality
    # monotone funnel
    assert res.n_input >= res.n_quality_pass >= res.n_after_dedup \
        >= res.n_sampled > 0
    assert res.total_tokens > 0 and res.n_shards == 4

    # written artifact: shard dirs, cleaned schema, shuffle order columns
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert 0 < len(dirs) <= 4
    back = spark.read.parquet(out)
    assert res.n_sampled == back.count()
    cols = set(back.columns)
    assert {"doc_id", "clean_text", "content_text", "n_pii", "pos",
            "source", "shard"} <= cols


def test_pipeline_cli(spark, tmp_path, capsys):
    """The __main__ entry drives the same build from arguments."""
    import json

    from downscaledclimatedata_spark import pipeline
    out = str(tmp_path / "cli_shards")
    pipeline.main(["--input", f"{SF_SMOKE}/documents.parquet",
                   "--output", out, "--budget-tokens", "3000",
                   "--shards", "2"])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_shards"] == 2 and got["n_sampled"] > 0
    assert spark.read.parquet(out).count() == got["n_sampled"]
