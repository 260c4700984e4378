"""Property tests: text operators vs independent pure-Python references
on arbitrary generated text (including whitespace runs, empty/short docs,
and high-repetition strings)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downscaledclimatedata_spark.operators.textops import (
    repetition_flags,
    top_terms,
)

_WORD = st.sampled_from(["a", "bb", "ccc", "dog", "fox", "the", "x9"])
_SEP = st.sampled_from([" ", "  ", "\t", " \t "])
_TEXT = st.builds(
    lambda words, seps: "".join(w + s for w, s in zip(words, seps + [" "])),
    st.lists(_WORD, min_size=0, max_size=12),
    st.lists(_SEP, min_size=0, max_size=11),
).map(lambda s: s.strip("\x00"))

_CORPUS = st.lists(_TEXT, min_size=1, max_size=8)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _py_flags(text: str):
    toks = _py_tokens(text)
    n = len(toks)
    top = max(Counter(toks).values()) if toks else 0
    bis = [" ".join(toks[i:i + 2]) for i in range(n - 1)] if n >= 2 else []
    dup = len(bis) - len(set(bis))
    return (n, top, dup, n < 20, top * 5 > n, dup * 10 > len(bis) * 3)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_CORPUS)
def test_repetition_flags_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.top_token_count, r.dup_bigram_count,
                      r.flag_too_short, r.flag_repetitive_token,
                      r.flag_repetitive_bigram)
           for r in repetition_flags(df, "text", "doc_id").collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_flags(t), f"doc {i!r}: {t!r}"


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_CORPUS)
def test_top_terms_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = top_terms(df, "text", "doc_id", k=3).collect()
    # python reference: tf per (doc, term); df = docs containing term
    tf: dict[tuple[int, str], int] = {}
    for i, t in enumerate(texts):
        for term, c in Counter(_py_tokens(t)).items():
            tf[(i, term)] = c
    dfreq = Counter(term for (_i, term) in tf)
    by_doc: dict[int, list] = {}
    for (i, term), c in tf.items():
        by_doc.setdefault(i, []).append((-c, dfreq[term], term))
    want = {}
    for i, lst in by_doc.items():
        for rnk, (negtf, d, term) in enumerate(sorted(lst)[:3], start=1):
            want[(i, rnk)] = (term, -negtf, d)
    got = {(r.doc_id, r.rnk): (r.term, r.tf, r.df) for r in rows}
    assert got == want


def test_q70_markov_rows_sum_to_one_per_from_state(spark):
    """Row-normalization invariant: outgoing probabilities of every
    from_type sum to exactly 1 (exact counts divided once)."""
    from downscaledclimatedata_spark.plans import all_specs
    rows = all_specs()["q70_markov_transitions"].spark(
        spark, "/root/testdata/sf0.001").collect()
    from collections import defaultdict
    sums = defaultdict(float)
    for r in rows:
        sums[r.from_type] += r.p
    assert sums and all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_tfidf_pairs_weight_rare_overlap_over_common(spark):
    """Two docs sharing only a RARE term score higher than two sharing
    only a corpus-frequent term of equal tf — the weighting the raw
    Jaccard family cannot express."""
    from downscaledclimatedata_spark.operators.textops import tfidf_doc_pairs

    common_half = [(i, "filler%d common" % i) for i in range(20)]
    docs = spark.createDataFrame(
        [(100, "alpha rareword"), (101, "beta rareword"),
         (102, "gamma common"), (103, "delta common")] + common_half,
        "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.cosine
             for r in tfidf_doc_pairs(docs, threshold=0.0).collect()}
    assert (100, 101) in pairs
    rare_cos = pairs[(100, 101)]
    common_cos = pairs.get((102, 103), 0.0)
    assert rare_cos > common_cos
    # identical docs would be cosine 1.0; these share one of two terms
    assert 0.0 < rare_cos < 1.0


def test_phrase_search_counts_and_overlap(spark):
    """Hand-checkable: overlapping and repeated occurrences counted,
    absent phrase -> no row, single-term phrase = term frequency."""
    from downscaledclimatedata_spark.operators.textops import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),      # "a b" x3, overlapping chain
         (2, "b a b a"),          # "a b" x1
         (3, "c c c")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in phrase_search(docs, ("a", "b")).collect()}
    assert out[1].n_matches == 3 and out[1].first_pos == 0
    assert out[2].n_matches == 1 and out[2].first_pos == 1
    assert 3 not in out
    single = {r.doc_id: r.n_matches
              for r in phrase_search(docs, ("c",)).collect()}
    assert single == {3: 3}
    three = {r.doc_id: r.n_matches
             for r in phrase_search(docs, ("a", "b", "a")).collect()}
    assert three == {1: 2, 2: 1}


def test_lm_familiarity_ranks_typical_over_gibberish(spark):
    """A document made of the corpus's dominant transitions scores
    higher than one with unique transitions; a deterministic corpus
    (every transition certain) scores exactly 1.0."""
    from downscaledclimatedata_spark.operators.textops import lm_familiarity

    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "x y x y"), (3, "q w e r t")],
        "doc_id long, text string")
    out = {r.doc_id: r.familiarity for r in lm_familiarity(docs).collect()}
    # doc 3's transitions are each unique (prob 1 given their prefix!) —
    # so compare docs sharing prefixes: x->y is 5/5... construct better:
    assert out[1] > 0 and out[2] > 0 and out[3] > 0

    docs2 = spark.createDataFrame(
        [(1, "x y x y"),        # transitions x->y, y->x: dominant
         (2, "x z"),            # x->z: 1 of 5 x-transitions
         (3, "x y")],
        "doc_id long, text string")
    out2 = {r.doc_id: r.familiarity for r in lm_familiarity(docs2).collect()}
    assert out2[3] > out2[2]   # typical transition beats rare one
    # deterministic corpus: single repeated transition = familiarity 1.0
    det = spark.createDataFrame([(1, "p p p p")], "doc_id long, text string")
    (row,) = lm_familiarity(det).collect()
    assert row.familiarity == 1.0 and row.n_bigrams == 3


def _reference_bpe(word_freqs: dict, n_merges: int):
    """Independent pure-Python BPE (Sennrich et al. 2016 pseudocode):
    the check the engine's Catalyst-fold implementation must match."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((rank, l, r, l + r, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference_implementation(spark):
    """The engine's merge sequence equals the independent reference on
    the classic Sennrich corpus AND on a tie-heavy corpus (lexicographic
    tie-break pinned)."""
    from downscaledclimatedata_spark.operators.textops import bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r.rank, r.left, r.right, r.merged, r.pair_count)
           for r in bpe_train(docs, n_merges=8).collect()]
    want = _reference_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 8)
    assert got == want

    tie_docs = spark.createDataFrame(
        [(1, "ab ab cd cd")], "doc_id long, text string")
    got2 = [(r.left, r.right) for r in
            bpe_train(tie_docs, n_merges=2).collect()]
    want2 = [(m[1], m[2]) for m in _reference_bpe({"ab": 2, "cd": 2}, 2)]
    assert got2 == want2 and got2[0] == ("a", "b")  # lexicographic tie


def test_bpe_train_stops_when_no_pair_repeats(spark):
    from downscaledclimatedata_spark.operators.textops import bpe_train
    docs = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    rows = bpe_train(docs, n_merges=5).collect()
    assert rows == []  # every pair occurs once; threshold is 2


def _reference_segment(word: str, merges) -> list:
    """Apply a learned merge list to one word, one-pass non-overlapping
    left-to-right per merge — the standard BPE apply the engine's fold
    must match."""
    syms = list(word) + ["</w>"]
    for _, l, r, m, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_segmentation(spark):
    """Per-doc subword stats AND the exact segmentation checksum equal
    an independent pure-Python encode on the Sennrich corpus."""
    import hashlib

    from downscaledclimatedata_spark.operators.textops import (
        BPE_SEG_MOD, bpe_encode)

    texts = {1: "low lower newest", 2: "newest newest widest low"}
    freqs: dict = {}
    for t in texts.values():
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    merges = _reference_bpe(freqs, 8)

    def seg_hash(word):
        s = " ".join(_reference_segment(word, merges))
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % BPE_SEG_MOD

    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in bpe_encode(docs, n_merges=8).collect()}
    for doc_id, text in texts.items():
        words = text.split()
        segs = [_reference_segment(w, merges) for w in words]
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_subwords == sum(len(s) for s in segs)
        assert got[doc_id].max_word_subwords == max(len(s) for s in segs)
        assert got[doc_id].seg_checksum == sum(seg_hash(w) for w in words)


def test_bpe_encode_one_pass_merge_semantics(spark):
    """[a,a,a,a] must segment as [aa,aa] (one-pass non-overlapping), not
    [aa,a,a] — the fold-vs-string-replace divergence case."""
    from downscaledclimatedata_spark.operators.textops import bpe_encode
    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    (row,) = bpe_encode(docs, n_merges=1).collect()
    # one merge learned: (a,a) -> each "aaaa" segments to [aa, aa, </w>]
    assert row.n_words == 2 and row.n_subwords == 6
    assert row.max_word_subwords == 3


def test_vocab_growth_exact_curve(spark):
    """Crafted corpus: 4 docs across 2 buckets; first-appearance
    bucketing and cumulative type/token math checked by hand."""
    from downscaledclimatedata_spark.operators.textops import vocab_growth
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"),          # bucket 0: types a,b,c; 4 toks
         (2, "a b d"), (3, "d e")],      # bucket 1: new types d,e; 5 toks
        "doc_id long, text string")
    rows = {r.bucket: r for r in
            vocab_growth(docs, n_buckets=2).collect()}
    assert rows[0].n_new_types == 3 and rows[0].bucket_tokens == 4
    assert rows[1].n_new_types == 2 and rows[1].bucket_tokens == 5
    assert rows[1].cum_types == 5 and rows[1].cum_tokens == 9
    assert rows[0].type_token_ratio == 3 / 4
    assert rows[1].bucket_docs == 2


def test_intradoc_repetition_hand_counts(spark):
    """'a b a b a b' has 2-gram windows [ab, ba, ab, ba, ab]: 5 windows,
    2 distinct, top 3 -> dup 0.6, top 0.6 -> repetitive. An all-distinct
    doc is clean; 1-token and NULL docs are unscoreable (NULL fracs,
    FALSE verdict), not errors."""
    from downscaledclimatedata_spark.operators.textops import (
        intradoc_repetition)
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "q w e r t y u"), (2, "one"), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in intradoc_repetition(docs).collect()}
    assert len(got) == 4
    r0 = got[0]
    assert (r0.n2_windows, r0.n2_top) == (5, 3)
    assert r0.dup2_frac == 3 / 5 and r0.top2_frac == 3 / 5
    # 3-grams: [aba, bab, aba, bab]: 4 windows, 2 distinct, top 2
    assert (r0.n3_windows, r0.n3_top) == (4, 2)
    assert r0.dup3_frac == 2 / 4
    assert r0.repetitive
    r1 = got[1]
    assert r1.dup2_frac == 0.0 and r1.dup3_frac == 0.0
    assert r1.n2_top == 1 and not r1.repetitive
    for d in (2, 3):
        r = got[d]
        assert r.n2_windows == 0 and r.n3_windows == 0
        assert r.dup2_frac is None and r.top3_frac is None
        assert r.repetitive is False


def test_intradoc_repetition_min_window_gate(spark):
    """A 2-token doc's single window is trivially 100% of itself — the
    MIN_WINDOWS gate keeps smallness from reading as repetition, while a
    doc that clears the gate with the same fractions is flagged."""
    from downscaledclimatedata_spark.operators.textops import (
        MIN_WINDOWS, intradoc_repetition)
    docs = spark.createDataFrame(
        [(7, "x y"), (8, "x y " * MIN_WINDOWS)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in intradoc_repetition(docs).collect()}
    r = got[7]
    assert (r.n2_windows, r.n2_top, r.n3_windows) == (1, 1, 0)
    assert r.top2_frac == 1.0 and r.dup3_frac is None
    # top2 == 1.0 > 0.20 but only 1 window: below the gate, not flagged
    assert not r.repetitive
    r8 = got[8]
    assert r8.n2_windows >= MIN_WINDOWS and r8.top2_frac > 0.20
    assert r8.repetitive


def test_perplexity_buckets_hand_model(spark):
    """3 scoreable docs with a hand-computable bigram model: c(a,b)=2,
    c(a,c)=1, c(a,.)=3 -> fp_keys 666666/666666/333333 at the 1e6
    scale; exact-thirds bucketing with doc_id tie-break; a 1-token doc
    is unscoreable -> NULL rank, tail."""
    from downscaledclimatedata_spark.operators.textops import (
        perplexity_buckets)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in perplexity_buckets(docs).collect()}
    assert got[0].fp_key == 666666 and got[2].fp_key == 333333
    assert (got[0].lm_rank, got[1].lm_rank, got[2].lm_rank) == (1, 2, 3)
    assert got[0].bucket == "head"      # rank 1 of 3
    assert got[1].bucket == "middle"    # tie on key, doc_id breaks it
    assert got[2].bucket == "tail"
    assert got[3].lm_rank is None and got[3].bucket == "tail"
    assert got[0].n_scored == 3


def test_perplexity_buckets_thirds_and_binned_rank_plan(spark):
    """Bucket sizes are exact thirds of the scored population, and every
    row_number window in the plan partitions on the value bin — never a
    bare global-order window (the single-reducer sort trap)."""
    import re
    from downscaledclimatedata_spark.operators.textops import (
        perplexity_buckets)
    # 12 docs with distinct scores: the shared-prefix model gives doc k
    # bigram (w, t{k}) a distinct conditional probability via repetition
    docs = spark.createDataFrame(
        [(k, ("w x " * (k + 1)).strip()) for k in range(12)],
        "doc_id long, text string")
    out = perplexity_buckets(docs)
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert sizes == {"head": 4, "middle": 4, "tail": 4}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert not re.search(r"Window \[[^\n]*\], \[\], \[", plan), plan
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_lmbin#" in line, plan


def test_langid_confusion_hand_matrix(spark):
    """Two labeled-en docs (one with Spanish markers -> predicted es)
    and one labeled-es doc predicted es: confusion counts and per-true
    shares are exact."""
    from downscaledclimatedata_spark.operators.textops import (
        langid_confusion)
    docs = spark.createDataFrame(
        [(0, "the quick fox and the dog", "en"),
         (1, "el perro y la casa de los gatos", "en"),   # mislabeled
         (2, "el gato y el perro en la casa", "es")],
        "doc_id long, text string, lang string")
    got = {(r.true_lang, r.predicted_lang): r
           for r in langid_confusion(docs).collect()}
    assert got[("en", "en")].n_docs == 1
    assert got[("en", "es")].n_docs == 1
    assert got[("en", "en")].share_of_true == 0.5
    assert got[("es", "es")].n_docs == 1
    assert got[("es", "es")].share_of_true == 1.0


def test_code_detect_routes_code_vs_prose(spark):
    """A function body is flagged; prose with the same length is not;
    a short symbol-dense fragment fails the length gate; NULL text is
    unscoreable-not-code."""
    from downscaledclimatedata_spark.operators.textops import code_signals
    code = ("int f(int x) { int y = 0; for (int i = 0; i < x; i++) "
            "{ y += v[i] * w[i]; } return y; }")
    prose = ("the quiet morning light settled over the valley and the "
             "river carried a thin mist toward the village in the east")
    docs = spark.createDataFrame(
        [(0, code), (1, prose), (2, "{x=1;}"), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in code_signals(docs).collect()}
    assert got[0].is_code and got[0].symbol_density > 0.05
    assert not got[1].is_code and got[1].stopword_density > 0.05
    assert not got[2].is_code          # below CODE_MIN_CHARS
    assert not got[3].is_code and got[3].n_chars == 0


def _py_winnow(text: str, k: int, w: int):
    """Independent pure-Python winnowing (Schleimer et al. 2003 fig. 5:
    rightmost minimal hash per window, record each print once)."""
    import hashlib
    toks = _py_tokens(text)
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    sel = set()
    for s in range(0, len(hs) - w + 1):
        win = hs[s:s + w]
        m = min(win)
        # rightmost occurrence of the min in this window
        pos = s + max(i for i, v in enumerate(win) if v == m)
        sel.add((hs[pos], pos))
    return len(grams), sel


def test_winnow_matches_python_reference_and_coverage(spark):
    """n_prints and the XOR checksum equal an independent Python
    winnower on repetitive AND diverse docs; every w-window contains a
    selected print (the guarantee mod-p sampling lacks); short docs are
    unscoreable, not errors."""
    from functools import reduce
    from downscaledclimatedata_spark.operators.textops import (
        WINNOW_K, WINNOW_W, winnow_fingerprints)
    texts = {
        0: "a b a b a b a b a b a b",         # heavy repetition: few prints
        1: ("one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen"),
        2: "x y",                              # < k tokens: no grams
        3: "p q r s t",                        # grams but < w windows
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in winnow_fingerprints(docs).collect()}
    for d in (0, 1):
        n_grams, sel = _py_winnow(texts[d], WINNOW_K, WINNOW_W)
        assert got[d].n_grams == n_grams
        assert got[d].n_prints == len(sel), texts[d]
        want = reduce(lambda a, b: a ^ b, (h + p for h, p in sel), 0)
        assert got[d].checksum == want
        # coverage guarantee: each window start has a print inside it
        poss = sorted(p for _h, p in sel)
        for s in range(0, n_grams - WINNOW_W + 1):
            assert any(s <= p < s + WINNOW_W for p in poss)
        assert got[d].density >= 1.0 / WINNOW_W
    assert got[2].n_grams == 0 and got[2].n_prints == 0
    assert got[2].density is None
    assert got[3].n_grams == 3 and got[3].n_prints == 0  # no full window


def test_mojibake_detects_damaged_text(spark):
    """Planted UTF-8-as-Latin-1 artifacts are counted; clean text with
    REAL accents is not flagged (the detector must not punish correct
    non-ASCII); NULL text unscoreable."""
    from downscaledclimatedata_spark.operators.textops import (
        mojibake_signals)
    damaged = ("the caf\u00c3\u00a9 serves na\u00c3\u00afve customers "
               "\u00e2\u20ac\u0153quoted\u00e2\u20ac\u2122 texts")
    clean = "the caf\u00e9 serves na\u00efve customers \u201cquoted\u201d texts"
    docs = spark.createDataFrame(
        [(0, damaged), (1, clean), (2, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in mojibake_signals(docs).collect()}
    assert got[0].encoding_damaged and got[0].n_mojibake >= 2
    assert not got[1].encoding_damaged and got[1].n_mojibake == 0
    assert got[2].n_chars == 0 and not got[2].encoding_damaged
