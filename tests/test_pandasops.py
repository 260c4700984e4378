"""Grouped pandas-UDF operators: values pinned against expression-based
computation inside Spark (tolerance for numpy-vs-JVM float ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.pandasops import (
    weighted_mean_agg, zscore_per_group,
)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_zscore_matches_expression_formulation(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_id: r.zscore for r in zscore_per_group(ev).collect()}
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    stats = ev.select(
        "event_id", "value",
        F.mean("value").over(w).alias("mu"),
        F.stddev_pop("value").over(w).alias("sd"))
    want = {r.event_id: (r.value - r.mu) / r.sd if r.sd and r.sd > 0 else 0.0
            for r in stats.collect()}
    assert set(got) == set(want)
    for eid, z in want.items():
        assert abs(got[eid] - z) < 1e-9, eid


def test_zscore_group_invariants(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    z = zscore_per_group(ev)
    per_group = (z.groupBy("user_id")
                 .agg(F.sum("zscore").alias("s"), F.count("*").alias("n"))
                 .collect())
    assert len(per_group) > 0
    for r in per_group:
        assert abs(r.s) < 1e-6, "z-scores must sum to ~0 per group"


def test_weighted_mean_matches_expression(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_type: r.weighted_mean
           for r in weighted_mean_agg(ev).collect()}
    w = (F.col("event_id") % 10 + 1).cast("double")
    want = {r.event_type: r.wm for r in
            (ev.groupBy("event_type")
             .agg((F.sum(F.col("value") * w) / F.sum(w)).alias("wm"))
             .collect())}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_compression_signals_match_direct_zlib(spark):
    """The Arrow-batched ratio must equal direct zlib on the driver;
    repetitive text must compress far better than high-entropy text."""
    import zlib

    from downscaledclimatedata_spark.operators.pandasops import (
        compression_signals)
    rep = "spam " * 200
    rnd = " ".join(f"w{i * 7919 % 1000}x{i * 104729 % 997}"
                   for i in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, rnd), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_signals(df).collect()}
    for i, t in [(1, rep), (2, rnd)]:
        b = t.encode()
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["n_compressed"] == len(zlib.compress(b, 6))
        assert abs(got[i]["ratio"] - len(zlib.compress(b, 6)) / len(b)) < 1e-12
    assert got[1]["ratio"] < 0.05          # boilerplate collapses
    assert got[2]["ratio"] > 0.3           # high-entropy stays large
    assert got[3]["ratio"] == 1.0 and got[4]["ratio"] == 1.0


def test_unicode_normalize_composed_decomposed_and_fold(spark):
    """Composed vs decomposed 'café' must normalize to the SAME nfc
    hash (the property that rescues exact-dedup on multilingual text),
    the decomposed row reports nfc_changed, and accent folding maps
    both to the hash of 'cafe'."""
    import hashlib

    import pandas as pd

    from downscaledclimatedata_spark.operators.pandasops import (
        unicode_normalize_report)

    composed = "café"          # é as one code point
    decomposed = "café"       # e + combining acute
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": [composed, decomposed, None]})
    out = {r.doc_id: r for r in unicode_normalize_report(
        spark.createDataFrame(pdf)).collect()}

    h = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
    assert out[1].nfc_hash == out[2].nfc_hash == h(composed)
    assert not out[1].nfc_changed and out[2].nfc_changed
    assert out[1].n_chars_raw == 4 and out[2].n_chars_raw == 5
    assert out[1].fold_hash == out[2].fold_hash == h("cafe")
    # NULL folds to empty
    assert out[3].n_chars_raw == 0 and out[3].nfc_hash == h("")


def test_capped_balance_matches_hand_fold(spark):
    """The two-sided clamp must equal a hand-walked sequence, including
    consecutive clamps at both bounds and the (ts, event_id) tiebreak."""
    import datetime as dt
    from downscaledclimatedata_spark.operators.pandasops import (
        CAPBAL_CAP, capped_balance)

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: +150.00 (clamped high to 200.00), -300.00 (clamped low
        # to 0), +50.00 -> 5000; same-ts pair ordered by event_id
        (1, t0, 1, "purchase", 150.00),
        (1, t0, 2, "signup", 150.00),     # 15000+15000=30000 -> clamp 20000
        (1, t0 + dt.timedelta(1), 3, "click", 300.00),  # -30000 -> clamp 0
        (1, t0 + dt.timedelta(2), 4, "purchase", 50.00),
        # user 2: never clamps
        (2, t0, 5, "purchase", 10.00),
        (2, t0 + dt.timedelta(1), 6, "view", 4.00),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double")
    got = {r["user_id"]: r for r in capped_balance(ev).collect()}
    assert got[1]["final_balance"] == 5000
    assert got[1]["n_clamped_high"] == 1
    assert got[1]["n_clamped_low"] == 1
    assert got[1]["n_events"] == 4
    assert got[2]["final_balance"] == 600
    assert got[2]["n_clamped_low"] == 0 and got[2]["n_clamped_high"] == 0
    assert CAPBAL_CAP == 20_000


def test_vectorized_cosine_equals_jvm_kernel(spark):
    """The numpy/Arrow twin must equal the JVM fold kernel EXACTLY —
    same dots (int64 matmul vs codegen fold), same per-pair IEEE
    division, same tie-breaks across batch boundaries."""
    from downscaledclimatedata_spark.operators.pandasops import (
        cosine_topk_vectorized)
    from downscaledclimatedata_spark.operators.similarity import (
        DIM, cosine_topk_quantized)

    rows = [(i, [((i * 31 + j * 7) % 17 - 8) / 4.0 for j in range(DIM)])
            for i in range(120)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(8)
    got = {(r.query_id, r.rnk): (r.match_id, r.cosine)
           for r in cosine_topk_vectorized(emb).collect()}
    want = {(r.query_id, r.rnk): (r.match_id, r.cosine)
            for r in cosine_topk_quantized(emb).collect()}
    assert got == want and len(got) > 0


def test_capped_sessions_cap_splits_without_gap(spark):
    """Planted cap semantics: events 15 min apart never trip the
    30-min gap, but the 2-h span cap splits the run — and the new
    session's span clock restarts at the splitting event."""
    import datetime as dt

    from downscaledclimatedata_spark.operators.pandasops import (
        capped_sessions)

    t0 = dt.datetime(2024, 1, 1)
    # 12 events, 15 min apart: span would be 165 min > 120 -> split at
    # the first event beyond the cap (minute 135, index 9)
    rows = [(i, t0 + dt.timedelta(minutes=15 * i), 1, "e", 1.0, "{}")
            for i in range(12)]
    # user 2: a 31-minute gap splits despite a tiny span
    rows += [(100, t0, 2, "e", 1.0, "{}"),
             (101, t0 + dt.timedelta(minutes=31), 2, "e", 1.0, "{}")]
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    ev = spark.createDataFrame(pdf)
    got = {(r.user_id, r.session_id): (r.n_events, r.span_us)
           for r in capped_sessions(ev).collect()}
    # user 1: events 0..8 (span 120 min == cap, not >) then 9..11
    assert got[(1, 0)] == (9, 120 * 60_000_000)
    assert got[(1, 1)] == (3, 30 * 60_000_000)
    # user 2: gap split -> two singleton sessions
    assert got[(2, 0)] == (1, 0) and got[(2, 1)] == (1, 0)
