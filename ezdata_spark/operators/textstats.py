"""Text analysis operators for training-data pipelines.

Extensions beyond the reference (SURVEY.md §7 phase 9): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All built-in column expressions — no Python in the row path — so they
compose with filters/aggregations under whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# deliberately small + deterministic (a real model is out of scope)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "des", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "en"],
}


def tokens(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text) -> Column:
    """BPE-approximating token count: word-piece regex splits on word
    boundaries, digits, and punctuation (a public heuristic: ~chars/4
    for English; we count regex pieces)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.filter(
        F.split(c, r"(?=[A-Z])|(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
        lambda t: t != "",
    )
    return F.size(pieces)


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1]. Everything codegen'd."""
    c = F.col(text)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    mean_word_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    stop_ratio = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_tok
    ).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.25
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25
        + uniq_ratio * 0.25
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_chars.alias("len_chars"),
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_token_ratio"),
        score.alias("quality_score"),
    )


def lang_votes(text) -> dict[str, Column]:
    """Stopword-overlap vote count per language (token containment)."""
    toks = tokens(text)
    out = {}
    for lang, words in _STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID. Deterministic tie policy: languages are
    checked in fixed order (en, de, fr, es); the first with the maximal
    vote count (and > 0) wins; no votes -> 'und'. The when-cascade is a
    plain CASE expression — SQL-mirrorable for the oracle."""
    votes = lang_votes(F.col(text))
    order = list(_STOPWORDS)
    cascade = None
    for lang in order:
        v = votes[lang]
        cond = (v > 0) & reduce(
            lambda a, b: a & b, [v >= votes[o] for o in order if o != lang], F.lit(True)
        )
        cascade = F.when(cond, F.lit(lang)) if cascade is None else cascade.when(cond, F.lit(lang))
    pred = cascade.otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def fingerprint(df: DataFrame, text: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content-defined fingerprint: xxhash64 of the normalized token
    stream (case/whitespace-insensitive rolling-hash analog); equal
    fingerprints = dedup-equivalent documents."""
    norm = F.concat_ws(" ", tokens(text))
    return df.withColumn(out, F.xxhash64(norm))
