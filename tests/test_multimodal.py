"""Multimodal plumbing: the mapInPandas contracts (schema, fan-out,
determinism) are real even though the decoders are stubs."""

from __future__ import annotations

from downscaledclimatedata_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_SIZE,
    FRAME_STRIDE,
    MAX_FRAMES,
    decode_payloads,
    extract_features,
    sample_frames,
    with_binary_payload,
)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return with_binary_payload(load_table(spark, SF_SMOKE, "documents"))


def test_frame_sampling_fanout(spark):
    docs = _docs(spark)
    n_docs = docs.count()
    frames = sample_frames(docs).collect()
    assert len(frames) > n_docs, "fan-out must exceed 1 row per doc on average"
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    lengths = {len(r.frame) for r in frames}
    assert lengths == {FRAME_SIZE}
    for doc_id, rows in by_doc.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(len(rows)))
        assert len(rows) <= MAX_FRAMES
        for r in rows:
            assert r.byte_offset == r.frame_idx * FRAME_STRIDE


def test_frame_bytes_match_payload(spark):
    docs = _docs(spark).limit(5)
    payloads = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    for r in sample_frames(docs).collect():
        blob = payloads[r.doc_id]
        assert bytes(r.frame) == blob[r.byte_offset:r.byte_offset + FRAME_SIZE]


def test_feature_extraction_contract(spark):
    docs = _docs(spark)
    feats = extract_features(docs).collect()
    assert len(feats) == docs.count()
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        sq = sum(x * x for x in r.feature)
        assert abs(sq - 1.0) < 1e-3, "features must be L2-normalized"


def test_feature_extraction_deterministic(spark):
    docs = _docs(spark).limit(10)
    a = {r.doc_id: r.feature for r in extract_features(docs).collect()}
    b = {r.doc_id: r.feature for r in extract_features(docs).collect()}
    assert a == b


def test_decode_deterministic_dims(spark):
    docs = _docs(spark).limit(10)
    rows = {r.doc_id: r for r in decode_payloads(docs).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    for doc_id, r in rows.items():
        n = len(payloads[doc_id])
        assert r.n_bytes == n
        assert r.width == 64 + (n % 193)
        assert r.height == 64 + (n % 97)
