"""Text-analysis operators for training-data pipelines (column-level,
JVM-side: pure pyspark.sql.functions, no Python UDFs).

Each operator has an exact ANSI-SQL twin used by the DuckDB oracle (see
__spark_entry__.py); both sides alias columns identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny distinctive function-word markers per language for the n-gram/
# stopword language-ID heuristic; deliberately small and deterministic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in|that|it|for|with)\b",
    "de": r"\b(der|die|und|das|nicht|ist|ein|mit|den|von)\b",
    "fr": r"\b(le|la|les|et|des|est|dans|pour|que|une)\b",
    "es": r"\b(el|los|las|es|en|un|una|por|para|con)\b",
}

_PUNCT_RE = r"[\.,;:!\?]"
_UPPER_RE = r"[A-Z]"
_TOKEN_RE = r"[A-Za-z0-9_]+"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    "Token count + quality-scoring ratios per document."
    text = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    n_chars = F.length(text)
    n_punct = F.regexp_count(text, F.lit(_PUNCT_RE))
    n_upper = F.regexp_count(text, F.lit(_UPPER_RE))
    n_stop = F.regexp_count(F.lower(text), F.lit(LANG_MARKERS["en"]))
    return df.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars_measured"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("mean_token_len"),
    )


def token_stats_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    "DuckDB twin of token_stats."
    return f"""
    SELECT {id_col},
           CAST(len(regexp_split_to_array(trim({text_col}), '\\s+')) AS INT) AS n_tokens,
           CAST(length({text_col}) AS INT) AS n_chars_measured,
           ROUND(len(regexp_extract_all({text_col}, '{_PUNCT_RE}')) * 1.0
                 / GREATEST(length({text_col}), 1), 6) AS punct_ratio,
           ROUND(len(regexp_extract_all({text_col}, '{_UPPER_RE}')) * 1.0
                 / GREATEST(length({text_col}), 1), 6) AS upper_ratio,
           ROUND(len(regexp_extract_all(lower({text_col}), '{LANG_MARKERS["en"]}')) * 1.0
                 / GREATEST(len(regexp_split_to_array(trim({text_col}), '\\s+')), 1), 6) AS stopword_ratio,
           ROUND(length({text_col}) * 1.0
                 / GREATEST(len(regexp_split_to_array(trim({text_col}), '\\s+')), 1), 6) AS mean_token_len
    FROM {table}
    """


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    "Stopword-marker language ID: argmax of per-language marker hits."
    lowered = F.lower(F.col(text_col))
    scores = {lang: F.regexp_count(lowered, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    # deterministic argmax: fixed language order, strict greater-than
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.select(
        F.col(id_col),
        best.alias("pred_lang"),
        best_score.cast("int").alias("marker_hits"),
    )


def lang_id_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    langs = list(LANG_MARKERS)
    score_exprs = {
        lang: f"len(regexp_extract_all(lower({text_col}), '{pat}'))" for lang, pat in LANG_MARKERS.items()
    }
    pred = f"'{langs[0]}'"
    best = score_exprs[langs[0]]
    for lang in langs[1:]:
        pred = f"CASE WHEN {score_exprs[lang]} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN {score_exprs[lang]} > {best} THEN {score_exprs[lang]} ELSE {best} END"
    return f"""
    SELECT {id_col}, {pred} AS pred_lang, CAST({best} AS INT) AS marker_hits
    FROM {table}
    """


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    "Deterministic document fingerprint: md5 of whitespace-normalized lowercase text."
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(normalized).alias("fp"))


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
    SELECT {id_col}, md5(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')) AS fp
    FROM {table}
    """
