"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Catalyst expressions (split/filter/transform/aggregate/regexp) —
one narrow pass over the corpus, no shuffle except final aggregations, no
Python UDFs. Ratios divide exact integer counts so doubles are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.functions.hashing import md5_long, md5_long_sql
from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table, load_table_parallel

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# marker vocabularies for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de5", "le5", "shi4", "zai4"),  # pinyin-romanized markers
}
_LANG_ORDER = ("en", "es", "fr", "de", "zh")  # deterministic tie-break order

_WORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace + regex (BPE-ish) token counts and length stats."""
    toks = _tokens(F.col(text_col))
    total_len = F.aggregate(F.transform(toks, F.length),
                            F.lit(0), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(_WORD_RE)).alias("n_regex_tokens"),
        F.length(text_col).alias("n_chars"),
        (total_len.cast("double") / F.size(toks).cast("double")).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length/stopword/uniqueness heuristic quality score in [0,1]."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_uniq = F.size(F.array_distinct(toks))
    stop_ratio = n_stop.cast("double") / n.cast("double")
    uniq_ratio = n_uniq.cast("double") / n.cast("double")
    len_score = F.least(n.cast("double") / F.lit(50.0), F.lit(1.0))
    score = (F.lit(0.4) * len_score + F.lit(0.3) * uniq_ratio
             + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0)))
    return df.select(
        F.col(id_col), n.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-vocabulary language scores + argmax prediction.

    Deterministic: ties resolve in _LANG_ORDER. (A production system
    would use char n-gram profiles; the operator shape — per-language
    score columns + argmax — is identical.)
    """
    toks = _tokens(F.col(text_col))
    cols = [F.col(id_col)]
    for lang in _LANG_ORDER:
        marker_arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cols.append(F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
                    .alias(f"score_{lang}"))
    scored = df.select(*cols)
    best = None
    for lang in _LANG_ORDER:
        cond = None
        for other in _LANG_ORDER:
            if other == lang:
                continue
            # strictly greater than later langs, >= earlier langs handled by order
            c = (F.col(f"score_{lang}") >= F.col(f"score_{other}")) \
                if _LANG_ORDER.index(other) > _LANG_ORDER.index(lang) \
                else (F.col(f"score_{lang}") > F.col(f"score_{other}"))
            cond = c if cond is None else (cond & c)
        term = F.when(cond, F.lit(lang))
        best = term if best is None else best.when(cond, F.lit(lang))
    return scored.select(
        id_col, *[f"score_{lang}" for lang in _LANG_ORDER],
        F.coalesce(best, F.lit(_LANG_ORDER[0])).alias("predicted_lang"))


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """60-bit content fingerprint of whitespace-normalized text."""
    norm = F.concat_ws(" ", _tokens(F.col(text_col)))
    return df.select(F.col(id_col), md5_long(norm).alias("fingerprint"))


# --- oracle-checked query entries -------------------------------------------

_TOKS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


def text_token_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table_parallel(spark, sf_dir, "documents", key="doc_id"), "text", "doc_id")


_TEXT_TOKENS_SQL = f"""
SELECT doc_id,
  len({_TOKS_SQL}) AS n_tokens,
  len(regexp_extract_all(text, '{_WORD_RE}')) AS n_regex_tokens,
  length(text) AS n_chars,
  CAST(list_sum(list_transform({_TOKS_SQL}, x -> length(x))) AS DOUBLE)
    / CAST(len({_TOKS_SQL}) AS DOUBLE) AS avg_token_len
FROM documents
"""


def text_quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load_table_parallel(spark, sf_dir, "documents", key="doc_id"), "text", "doc_id")


_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
_TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS n_stop,
    len(list_distinct(toks)) AS n_uniq
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
  CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unique_ratio,
  0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
    + 0.3 * (CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE))
    + 0.3 * least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5, 1.0) AS quality_score
FROM m
"""


def text_langid_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table_parallel(spark, sf_dir, "documents", key="doc_id"), "text", "doc_id")


def _langid_sql() -> str:
    score_cols = ",\n    ".join(
        f"len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"], x))) AS score_{lang}"
        for lang in _LANG_ORDER)
    # argmax with _LANG_ORDER tie-break
    cases = []
    for lang in _LANG_ORDER:
        conds = []
        for other in _LANG_ORDER:
            if other == lang:
                continue
            op = ">=" if _LANG_ORDER.index(other) > _LANG_ORDER.index(lang) else ">"
            conds.append(f"score_{lang} {op} score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{_LANG_ORDER[0]}' END"
    cols = ", ".join(f"score_{lang}" for lang in _LANG_ORDER)
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
s AS (SELECT doc_id,
    {score_cols}
  FROM t)
SELECT doc_id, {cols}, {case_sql} AS predicted_lang FROM s
"""


def text_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(load_table_parallel(spark, sf_dir, "documents", key="doc_id"), "text", "doc_id")


_TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id, {md5_long_sql(f"array_to_string({_TOKS_SQL}, ' ')")} AS fingerprint
FROM documents
"""


def text_rolling_hash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling hash over the token stream: a true
    order-sensitive document fingerprint (unlike the md5-of-joined-text
    one, this composes incrementally and supports windowed substring
    fingerprinting at scale). Fold stays JVM-side via `aggregate`."""
    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    hashes = F.transform(toks, lambda t: md5_long(t) % F.lit(2147483647))
    poly = F.aggregate(hashes, F.lit(0).cast("long"),
                       lambda acc, h: (acc * 31 + h) % 2147483647)
    return docs.select("doc_id", poly.alias("rolling_hash"))


_TEXT_ROLLING_SQL = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform({_TOKS_SQL}, x -> {md5_long_sql('x')} % 2147483647)),
    (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_hash
FROM documents
"""


register(QuerySpec("text_rolling_hash", text_rolling_hash_query, _TEXT_ROLLING_SQL,
                   description="Rabin-Karp polynomial rolling-hash fingerprint over the token stream"))
register(QuerySpec("text_token_stats", text_token_stats_query, _TEXT_TOKENS_SQL,
                   description="whitespace + regex token counting, length stats"))
register(QuerySpec("text_quality", text_quality_query, _TEXT_QUALITY_SQL, headline=True,
                   description="heuristic quality scoring (length/stopword/uniqueness)"))
register(QuerySpec("text_langid", text_langid_query, _langid_sql(),
                   description="marker-vocabulary language ID with deterministic argmax"))
register(QuerySpec("text_fingerprint", text_fingerprint_query, _TEXT_FINGERPRINT_SQL,
                   description="60-bit md5 content fingerprint of normalized text"))
