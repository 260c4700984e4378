"""Edge cases for shingle-based dedup operators: short and empty docs.

Regression for the F.sequence descending-range bug: sequence(1, stop)
produces [1, 0] when stop = 0, and element_at(toks, 0) throws. Docs with
fewer than n tokens must yield zero shingles (matching the DuckDB
oracle's empty range()), not an error.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.dedup import (
    minhash_signatures,
    ngram_jaccard_pairs,
    shingled_rows,
    simhash,
)


def _short_docs(spark):
    return spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "only two"),
            (4, "exactly three tokens"),
            (5, "this one has plenty of tokens to shingle"),
            (6, "   "),  # whitespace-only -> zero tokens after filter
        ],
        "doc_id int, text string",
    )


def test_shingles_empty_for_short_docs(spark):
    docs = _short_docs(spark)
    rows = shingled_rows(docs, "text", "doc_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.shingle)
    # 0-, 1-, 2-token and whitespace-only docs produce no shingles
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc and 6 not in by_doc
    assert by_doc[4] == ["exactly three tokens"]
    assert len(by_doc[5]) == 8 - 3 + 1


def test_minhash_and_simhash_survive_short_docs(spark):
    docs = _short_docs(spark)
    sigs = minhash_signatures(docs, "text", "doc_id")
    # short docs simply have no signature rows (no shingles to aggregate)
    assert sorted(r.doc_id for r in sigs.select("doc_id").collect()) == [4, 5]
    sh = simhash(docs, "text", "doc_id")
    assert sorted(r.doc_id for r in sh.select("doc_id").collect()) == [4, 5]


def test_jaccard_survives_short_docs(spark):
    docs = _short_docs(spark)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0)
    # no crash; only docs with shingles can pair, and these two differ
    ids = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all(a in (4, 5) and b in (4, 5) for a, b in ids)


def test_lsh_bucket_cap_drops_mega_bucket(spark):
    from downscaledclimatedata_spark.operators.dedup import (
        MINHASH_PERMS, lsh_candidate_pairs)
    cols = "doc_id int, " + ", ".join(f"m{k} int" for k in range(MINHASH_PERMS))
    # 300 identical signatures -> one mega-bucket per band
    mega = spark.createDataFrame(
        [(i, *([7] * MINHASH_PERMS)) for i in range(300)], cols)
    assert lsh_candidate_pairs(mega, "doc_id", max_bucket=50).count() == 0
    # below the cap the same construction still yields all C(10,2) pairs
    small = spark.createDataFrame(
        [(i, *([7] * MINHASH_PERMS)) for i in range(10)], cols)
    assert lsh_candidate_pairs(small, "doc_id", max_bucket=50).count() == 45


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer doc: containment
    ~1.0, Jaccard far below threshold — the asymmetric signal the
    operator exists for."""
    from downscaledclimatedata_spark.operators.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id int, text string",
    )
    pairs = containment_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    assert len(pairs) == 1
    row = pairs[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.containment == 1.0
    # the same pair is invisible at any reasonable Jaccard threshold
    jac = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0).collect()
    assert all(r.jaccard < 0.05 for r in jac)


def test_signal_eval_scores_every_generator_against_one_truth(spark):
    """The per-signal eval publishes one row per generator, and the
    planted quote-in-doc pair is found by containment ALONE — the
    blind spot the multi-signal union exists to cover. The verified-
    Jaccard signal's precision is 1.0 by construction (exact
    verification at the truth threshold)."""
    from downscaledclimatedata_spark.operators.dedup import signal_eval

    quote = "the quick brown fox jumps over the lazy dog tonight again"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    near_a = " ".join(f"shared{i} common{i} token{i}" for i in range(40))
    near_b = near_a + " tailword"
    docs = spark.createDataFrame(
        [(1, quote),                                   # quoted short doc
         (2, filler + " " + quote + " " + filler),     # container
         (3, near_a), (4, near_b),                     # true near-dups
         (5, " ".join(f"z{i} q{i}" for i in range(60)))],
        "doc_id int, text string")
    rows = {r["signal"]: r for r in signal_eval(docs).collect()}
    assert set(rows) == {"minhash_lsh", "jaccard_verified", "simhash",
                         "containment"}
    # the (3,4) near-identical pair is ground truth; (1,2) is not
    # (jaccard ~0.05 < 0.2)
    assert all(r["n_truth"] == 1 for r in rows.values())
    # containment fires on BOTH the true near-dup and the quote-in-doc
    # pair — the extra pair the jaccard-truth signals cannot see
    assert rows["containment"]["n_candidates"] == 2
    assert rows["containment"]["tp"] == 1
    # verified jaccard: exact verification at the truth threshold =>
    # every candidate is true (precision 1.0)
    assert rows["jaccard_verified"]["precision"] == 1.0
    assert rows["jaccard_verified"]["tp"] == rows["jaccard_verified"]["n_candidates"]
    # the jaccard-approximating generators do NOT emit the (1,2) pair:
    # with only (3,4) as a plausible candidate they report at most 1
    for s in ("minhash_lsh", "jaccard_verified", "simhash"):
        assert rows[s]["n_candidates"] <= 1, s


def test_decontaminate_flags_planted_eval_overlap(spark):
    """A training doc quoting a benchmark answer verbatim is flagged
    with the exact overlapping-gram count; clean docs report zeros; the
    eval-gram side is broadcast so the corpus side never shuffles
    before the join."""
    from downscaledclimatedata_spark.operators.dedup import decontaminate

    bench = "what is the capital of france the answer is paris obviously"
    docs = spark.createDataFrame(
        [(1, "intro text " + bench + " trailing words here"),
         (2, "completely unrelated content with many different tokens"),
         (3, "the answer is paris obviously said the model")],
        "doc_id int, text string")
    evals = spark.createDataFrame([(100, bench)], "doc_id int, text string")
    out = {r.doc_id: r for r in decontaminate(docs, evals).collect()}
    # doc 1 contains the full 11-token quote: 11 - 5 + 1 = 7 grams
    assert out[1].contaminated and out[1].n_gram_hits == 7
    assert out[1].n_eval_docs == 1
    # doc 3 shares only the 5-gram "the answer is paris obviously"
    assert out[3].contaminated and out[3].n_gram_hits == 1
    assert not out[2].contaminated and out[2].n_gram_hits == 0
    # plan: eval grams broadcast (corpus side shuffle-free up to the join)
    plan = decontaminate(docs, evals)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_containment_prefix_filter_drops_boilerplate_shingles(spark):
    """A shingle shared by > max_df docs is dropped before pairing, so
    boilerplate alone creates no pairs (and no k-squared blow-up)."""
    from downscaledclimatedata_spark.operators.dedup import containment_pairs

    boiler = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [(i, f"unique{i} token{i} " + boiler) for i in range(10)],
        "doc_id int, text string",
    )
    # boilerplate shingles have df=10 > max_df=4 -> no candidate pairs
    assert containment_pairs(docs, "text", "doc_id",
                             threshold=0.1, max_df=4).count() == 0
    # with the cap lifted the same corpus pairs every doc with every other
    assert containment_pairs(docs, "text", "doc_id",
                             threshold=0.1, max_df=100).count() == 45


def test_simhash_pairs_find_near_identical_docs_only(spark):
    """Hamming <= 3 pairs surface near-identical docs; unrelated docs are
    never paired. Candidate recall inside the hamming bound is exact by
    the pigeonhole block construction."""
    from downscaledclimatedata_spark.operators.dedup import simhash_pairs

    base = " ".join(f"token{i} filler{i} word{i}" for i in range(60))
    near = base.replace("token7", "token7x")  # tiny perturbation
    other = " ".join(f"zzz{i} qqq{i} vvv{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id int, text string")
    rows = simhash_pairs(docs, "text", "doc_id").collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].hamming <= 3


def test_simhash_pairs_rejects_ham_max_beyond_pigeonhole(spark):
    """ham_max > SIMHASH_BLOCKS-1 breaks the exact-recall guarantee of
    the block equi-join, so it must raise rather than silently return an
    incomplete pair set."""
    import pytest

    from downscaledclimatedata_spark.operators.dedup import (
        SIMHASH_BLOCKS,
        simhash_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    with pytest.raises(ValueError, match="exact-recall"):
        simhash_pairs(docs, "text", "doc_id", ham_max=SIMHASH_BLOCKS)


def test_simhash_pairs_no_double_checkpoint(spark, monkeypatch):
    """A caller-supplied fingerprints relation must be used as-is — no
    second localCheckpoint materialization inside simhash_pairs."""
    from pyspark.sql import DataFrame

    from downscaledclimatedata_spark.operators.dedup import simhash, simhash_pairs

    base = " ".join(f"token{i} filler{i} word{i}" for i in range(60))
    near = base.replace("token7", "token7x")
    docs = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id int, text string")
    fp = simhash(docs, "text", "doc_id").localCheckpoint()

    calls = []
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **kw):
        calls.append(self)
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    rows = simhash_pairs(docs, "text", "doc_id", fingerprints=fp).collect()
    assert not calls, "pre-materialized fingerprints were re-checkpointed"
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]


def test_multi_signal_clusters_merge_evidence_across_generators(spark):
    """A doc-in-doc cluster visible ONLY to containment and a
    near-identical cluster visible to minhash+simhash both appear in one
    multi-signal clustering, each labeled with its contributing signals."""
    from downscaledclimatedata_spark.operators.dedup import (
        multi_signal_clusters,
        multi_signal_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    near_a = " ".join(f"token{i} filler{i} word{i}" for i in range(60))
    near_b = near_a.replace("token7", "token7x")
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler),
            (3, near_a),
            (4, near_b),
            (5, " ".join(f"zzz{i} qqq{i} vvv{i}" for i in range(60))),
        ],
        "doc_id int, text string",
    )
    pairs = multi_signal_pairs(docs, "text", "doc_id",
                               containment_threshold=0.9)
    clusters = {r.comp: r for r in multi_signal_clusters(pairs).collect()}
    assert set(clusters) == {1, 3}
    # doc-in-doc: containment evidence ONLY — jaccard/simhash blind here
    assert clusters[1].cluster_size == 2
    assert clusters[1].signals == "containment"
    # near-identical: jaccard + simhash evidence (containment may also
    # fire — near-identical docs contain each other)
    assert clusters[3].cluster_size == 2
    assert "minhash_jaccard" in clusters[3].signals
    assert "simhash" in clusters[3].signals


def test_span_scrub_removes_covered_tokens_and_reassembles(spark):
    """Hand-checked Lee-style span removal: a 5-token span shared by two
    docs is deleted from BOTH, surrounding tokens survive in order, a
    fully-covered doc survives as empty text, and a short doc (< n
    tokens) passes through untouched."""
    from downscaledclimatedata_spark.operators.dedup import span_scrub
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, f"alpha {shared} omega"),
         (2, f"{shared}"),                      # fully covered
         (3, "tiny doc"),                       # < 5 tokens: no windows
         (4, f"beta gamma {shared} delta")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in span_scrub(docs).collect()}
    assert out[1].scrubbed_text == "alpha omega"
    assert out[1].n_tokens == 7 and out[1].n_removed == 5
    assert out[2].scrubbed_text == "" and out[2].n_removed == 5
    assert out[3].scrubbed_text == "tiny doc" and out[3].n_removed == 0
    assert out[4].scrubbed_text == "beta gamma delta"


def test_span_scrub_overlapping_windows_cover_union(spark):
    """Overlapping repeated windows delete the UNION of their positions:
    six shared tokens = two overlapping 5-windows, all six removed."""
    from downscaledclimatedata_spark.operators.dedup import span_scrub
    shared = "s1 s2 s3 s4 s5 s6"
    docs = spark.createDataFrame(
        [(1, f"keep1 {shared} keep2"), (2, f"{shared} other words here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in span_scrub(docs).collect()}
    assert out[1].scrubbed_text == "keep1 keep2" and out[1].n_removed == 6
    assert out[2].scrubbed_text == "other words here"


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The CDC property: one token inserted at the front shifts every
    fixed-size boundary but only the FIRST content-defined chunk —
    later chunks keep identical hashes, so the two docs share duplicate
    chunk mass at sub-document granularity."""
    import hashlib
    import random
    from downscaledclimatedata_spark.operators.dedup import (
        CDC_D, CDC_W, cdc_chunk_stats)

    rng = random.Random(3)
    base = [f"w{rng.randrange(5000)}" for _ in range(400)]

    def cuts(toks):
        out = []
        for s in range(2, len(toks) - CDC_W + 2):       # 1-based starts
            win = " ".join(toks[s - 1:s - 1 + CDC_W])
            h = int(hashlib.md5(win.encode()).hexdigest()[:15], 16)
            if h % CDC_D == 0:
                out.append(s)
        return out

    assert len(cuts(base)) >= 3, "need a multi-chunk doc for the test"
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, "inserted " + " ".join(base))],
        "doc_id long, text string")
    out = {r.doc_id: r for r in cdc_chunk_stats(docs).collect()}
    # all chunks after the first shared cut are identical across docs
    assert out[1].n_dup_chunks >= 2 and out[2].n_dup_chunks >= 2
    assert out[1].dup_tokens == out[2].dup_tokens > 0
    # and unrelated docs share nothing
    docs2 = spark.createDataFrame(
        [(1, " ".join(base)),
         (2, " ".join(f"z{rng.randrange(5000)}" for _ in range(300)))],
        "doc_id long, text string")
    out2 = {r.doc_id: r for r in cdc_chunk_stats(docs2).collect()}
    assert out2[1].n_dup_chunks == 0 and out2[2].n_dup_chunks == 0


def test_cdc_short_doc_is_one_chunk(spark):
    from downscaledclimatedata_spark.operators.dedup import cdc_chunk_stats
    docs = spark.createDataFrame([(1, "just three tokens")],
                                 "doc_id long, text string")
    (row,) = cdc_chunk_stats(docs).collect()
    assert row.n_chunks == 1 and row.total_tokens == 3
    assert row.n_dup_chunks == 0 and row.dup_tokens == 0


def test_leakage_safe_split_keeps_families_together(spark):
    """Near-identical docs share a family and hence a split — even when
    their per-document hashes WOULD straddle the boundary (the q56
    failure mode this operator exists to prevent). Singletons are their
    own family."""
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from downscaledclimatedata_spark.operators.dedup import (
        leakage_safe_split)
    from pyspark.sql import functions as F

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    # find two ids whose DOC-level split hashes differ across the 80
    # boundary, to prove the family split overrides them
    probe = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long").select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string"), seed="famsplit:")
         % 100).alias("b")).collect()
    by = {r.doc_id: r.b for r in probe}
    lo = next(i for i in by if by[i] < 80)
    hi = next(i for i in by if by[i] >= 80)
    docs = spark.createDataFrame(
        [(lo, base), (hi, base + " extra"), (199, "totally different "
          "unrelated text about spark shuffles and parquet footers "
          "written in another register entirely for the test")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in leakage_safe_split(docs).collect()}
    assert got[lo].family_id == got[hi].family_id == min(lo, hi)
    assert got[lo].split == got[hi].split          # no straddle
    assert got[199].family_id == 199               # singleton
    # doc-level hashes DID straddle — the family hash decided
    assert (by[lo] < 80) != (by[hi] < 80)


def test_quality_keep_elects_better_doc_over_min_id(spark):
    """Two near-dup docs where the LOWER id is the degraded copy: the
    election keeps the higher-quality higher-id doc and reports that it
    beats the min-id rule; singletons emit no row."""
    from downscaledclimatedata_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, quality_keep)

    rich = ("the quick brown fox jumps over the lazy dog while the "
            "other animals watch from the shade of a tall green tree "
            "and the river runs quietly behind them all day as birds "
            "sing their evening songs and a warm wind moves the grass "
            "toward the old stone bridge near the quiet village road")
    # degraded copy: past the 50-token length cap on both docs, so the
    # repeated filler can only CRUSH the unique-ratio term
    degraded = rich + " spam" * 30
    docs = spark.createDataFrame(
        [(10, degraded), (20, rich),
         (99, "an unrelated singleton about parquet row groups and "
              "vectorized readers that matches nothing else here")],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, "text", "doc_id")
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    assert pairs.count() >= 1, "planted near-dups must be candidates"
    rows = quality_keep(docs, pairs).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.n_members == 2
    assert r.keep_id == 20 and r.beats_min_id
