"""PII scrub: span semantics, redaction-order contract, and the planted
population — crafted rows exercise the boundary cases the synthetic
corpus can't."""

from __future__ import annotations

from downscaledclimatedata_spark.operators.textops import (
    PII_PLANT_MOD, pii_redact)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r.doc_id: r for r in pii_redact(df, "text", "doc_id").collect()}


def test_pii_span_and_boundary_semantics(spark):
    got = _run(spark, [
        "mail me at john.doe+x@test.org now",        # 0: plain email
        "server 192.168.0.1 port 80",                # 1: plain IPv4
        "call 555-1234 or 555-12345",                # 2: \b kills the 2nd
        "ping admin@10.0.0.2.net then 10.0.0.3 ok",  # 3: order contract
        None,                                        # 4: NULL text
        "no pii here at all",                        # 5: clean
    ])
    assert (got[0].n_emails, got[0].n_ips, got[0].n_phones) == (1, 0, 0)
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (0, 1, 0)
    # 555-12345 has no word boundary after the 4th digit -> only one hit
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 0, 1)
    # the ip-shaped domain is consumed by the EMAIL pass (redaction order
    # is part of the contract); only the standalone address counts as IP
    assert (got[3].n_emails, got[3].n_ips) == (1, 1)
    assert (got[4].n_emails, got[4].n_ips, got[4].n_phones) == (0, 0, 0)
    assert not got[4].had_pii and got[4].chars_removed == 0
    assert not got[5].had_pii and got[5].chars_removed == 0
    assert got[0].had_pii and got[1].had_pii and got[2].had_pii


def test_pii_redaction_changes_fingerprint_only_when_hit(spark):
    clean = "identical text either way"
    dirty = "reach me at a@bb.cc please"
    got = _run(spark, [clean, dirty, clean])
    # clean docs: fingerprint is stable and scrub removes nothing
    assert got[0].redacted_fp == got[2].redacted_fp
    assert got[0].chars_removed == 0
    # dirty doc: the redacted fingerprint differs from the clean docs'
    # and the delta reflects '<EMAIL>' standing in for 'a@bb.cc'
    assert got[1].redacted_fp != got[0].redacted_fp
    assert got[1].chars_removed == len("a@bb.cc") - len("<EMAIL>")


def test_pii_planted_population_is_load_bearing(spark):
    from downscaledclimatedata_spark.operators.textops import (
        text_pii_redact_query)
    from tests.conftest import SF_SMOKE
    rows = text_pii_redact_query(spark, SF_SMOKE).collect()
    planted = [r for r in rows if r.doc_id % PII_PLANT_MOD == 0]
    assert planted, "planted rows must exist"
    # every planted doc triggers every class; unplanted docs are clean
    assert all(r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1
               for r in planted)
    assert all(not r.had_pii for r in rows
               if r.doc_id % PII_PLANT_MOD != 0)


def test_readability_known_text_and_empty(spark):
    """Hand-checkable FK inputs: counts match manual tallies; empty and
    NULL docs yield NULL scores; missing terminator counts 1 sentence."""
    from downscaledclimatedata_spark.operators.textops import (
        readability_scores)
    df = spark.createDataFrame(
        [(0, "The cat sat. The dog ran!"),
         (1, "no terminator here"),
         (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           readability_scores(df, "text", "doc_id").collect()}
    # "The cat sat. The dog ran!": 6 words, 2 sentences,
    # vowel groups: e,a,a,e,o,a = 6
    assert (got[0].n_words, got[0].n_sentences, got[0].n_syllables) == (6, 2, 6)
    assert abs(got[0].words_per_sentence - 3.0) < 1e-12
    assert abs(got[0].flesch - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-9
    assert got[1].n_sentences == 1  # no [.!?] -> one sentence
    for d in (2, 3):
        assert got[d].n_words == 0 and got[d].flesch is None
