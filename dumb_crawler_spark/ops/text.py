"""Text analysis operators over a document corpus — language-ID, quality
scoring, token counting, fingerprinting. Pure Column expressions (JVM,
codegen) so they run at 100 TB scan speed; each has an ANSI-SQL oracle twin
in __spark_entry__.oracle_sql (DuckDB) for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword markers for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " la ", " de "),
    "de": (" der ", " und ", " das "),
}


def token_count(text: Column) -> Column:
    """Token count under TOKEN_RE (regexp_extract_all stays in codegen)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring: (len - len(without)) / len(needle).
    Same arithmetic is expressible in ANSI SQL — used by the DuckDB oracle."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((_count_occurrences(padded, m) for m in markers), F.lit(0))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Stopword-marker language ID with deterministic tie order en > es > de.
    (A heuristic stand-in for n-gram models; the shape — score per language,
    argmax, fixed tie order — is what matters for the pipeline.)"""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]), F.lit("en"))
        .when(s["es"] >= s["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


def quality_features(text: Column) -> list[Column]:
    """Length / punctuation / stopword-ratio features for quality filtering.
    All rounded at the source so engine and oracle hash identically."""
    n_chars = F.length(text)
    n_ws_tokens = whitespace_token_count(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    avg_token_len = F.round(n_chars / n_ws_tokens, 3)
    punct_ratio = F.round(n_punct / n_chars, 4)
    stop_hits = sum((v for v in lang_scores(text).values()), F.lit(0))
    stop_ratio = F.round(stop_hits / n_ws_tokens, 4)
    return [
        n_chars.alias("n_chars_calc"),
        n_ws_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
    ]


def quality_score(text: Column) -> Column:
    """Composite 0-100 quality score (deterministic integer arithmetic)."""
    n_tokens = whitespace_token_count(text)
    len_score = F.least(n_tokens, F.lit(100))
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    punct_penalty = F.least(punct * 2, F.lit(50))
    return F.greatest(len_score - punct_penalty, F.lit(0))


def normalize_text(text: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of normalized text (content identity that
    survives formatting churn; the rolling-hash shingle variant for locality
    is dedup.py's minhash path)."""
    return F.md5(normalize_text(text))


def with_text_analysis(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_bpe_tokens"),
        predict_lang(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )
