"""Text-analysis operators for LLM training-data pipelines.

All hot-path logic is built-in column expressions (split / filter /
aggregate lambdas / regexp) — JVM-side, codegen-friendly, no Python per
row. Designed so every statistic is *exactly* reproducible in the
DuckDB oracle (integer arithmetic or single IEEE double ops).

Operators:
- :func:`with_tokens`        — whitespace tokenization (array column)
- :func:`text_stats`         — length/token/type-token statistics
- :func:`quality_features`   — stopword ratio, language ID heuristic,
                               composite quality score
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import token_hash

# Compact English function-word list for the n-gram-free language-ID
# heuristic: a text with a healthy share of these is almost surely
# English. (Public-knowledge stopword set, not tied to any library.)
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "was", "are", "be",
)


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty strings dropped (leading/trailing
    whitespace would otherwise create phantom tokens)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens(F.col(text_col)))


def token_char_sum(toks: Column) -> Column:
    """Total characters across tokens (exact int arithmetic)."""
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def stopword_count(toks: Column, stopwords=EN_STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: sizes, distinct tokens, type-token ratio."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        token_char_sum(toks).alias("token_chars"),
        F.round(n_distinct.cast("double") / n_tokens, 4).alias("ttr"),
    )


# BPE-ish pre-tokenization classes (letter runs / digit runs / single
# punctuation marks) — the regex split BPE vocabularies apply before
# merging; counting these approximates trained-tokenizer token counts
# far better than whitespace words. The whitespace class is spelled
# EXPLICITLY (not \s) because the three engines disagree on \s: Java
# \s = [ \t\n\x0B\f\r], RE2's lacks \x0B, Python's is Unicode-wide
# (r8 advisory — verified piece-count divergence on 'a\x0Bb'). The
# explicit class below is bit-identical in Java, RE2/DuckDB, and
# Python re, making piece segmentation engine-independent.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"

ROLLING_HASH_MULT = 1_000_003
ROLLING_HASH_MOD = 2_147_483_647


def bpe_tokens(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_REGEX), 0)


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counts under the BPE-ish regex: total, word, number and
    punctuation tokens per document (single projection pass)."""
    toks = bpe_tokens(F.col(text_col))
    n_words = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
    n_nums = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    return df.select(
        id_col,
        F.size(toks).alias("n_bpe_tokens"),
        n_words.alias("n_word_tokens"),
        n_nums.alias("n_number_tokens"),
        (F.size(toks) - n_words - n_nums).alias("n_punct_tokens"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive polynomial rolling hash over whitespace tokens:

        h = fold(tokens, 0, (acc, t) -> (acc*M + md5_32(t)) mod P)

    Unlike the md5 content fingerprint it is *incremental* — streaming
    ingest can extend a document's hash without re-reading it — and
    mirrors exactly in DuckDB via list_reduce (plans/llm_text.py).
    """
    toks = tokens(F.col(text_col))
    h = F.aggregate(
        F.transform(toks, lambda t: token_hash(t, "roll")),
        F.lit(0).cast("long"),
        lambda acc, v: F.pmod(
            acc * ROLLING_HASH_MULT + v, F.lit(ROLLING_HASH_MOD).cast("long")
        ),
    )
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        h.alias("rolling_fp"),
    )


# Characteristic character-trigram profiles (space-padded word edges
# matter: ' th'/'he ' are English signatures, 'sch' German, etc.).
# Public-knowledge n-gram frequency facts, small on purpose — this is
# the deterministic heuristic tier, not a trained model.
LANG_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ing", " an", "and", "ion", " of"),
    "de": ("der", "sch", "ich", "ein", "und", " de", "en ", "cht"),
    "fr": (" le", "les", "de ", "ent", " qu", "que", "ait", " et"),
    "es": (" de", "os ", " la", "ión", "ado", "que", " el", "ar "),
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference —
    identical arithmetic in DuckDB:
    (length(t) - length(replace(t, n, ''))) / length(n)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle)))
    ) / len(needle)


def trigram_lang_scores(text: Column) -> dict[str, Column]:
    """Per-language score: summed occurrences of that language's
    characteristic trigrams, normalized by text length."""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: F.round(
            sum(
                (_count_occurrences(t, g) for g in grams), F.lit(0).cast("double")
            )
            / F.greatest(F.length(t), F.lit(1)),
            6,
        )
        for lang, grams in LANG_TRIGRAM_PROFILES.items()
    }


def language_id_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_score: float = 0.01,
) -> DataFrame:
    """N-gram language ID: argmax of trigram-profile scores, 'und' when
    no profile clears ``min_score``. Deterministic ties: profile order
    (en > de > fr > es). Pure column expressions — a 100 TB corpus
    lang-IDs as a single projection pass."""
    scores = trigram_lang_scores(F.col(text_col))
    langs = list(scores)
    best = F.greatest(*[scores[g] for g in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier profiles win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best >= min_score, pred).otherwise(F.lit("und"))
    return df.select(
        id_col,
        *[scores[g].alias(f"score_{g}") for g in langs],
        pred.alias("lang_pred"),
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword ratio, heuristic language ID, and a composite quality
    score in [0,1] (the standard pretraining-corpus filter features).

    score = 0.3*saturating(len) + 0.4*stop_ratio_component + 0.3*ttr —
    every term one deterministic double op, reproducible in SQL.
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = stopword_count(toks)
    stop_ratio = F.round(n_stop.cast("double") / n_tokens, 4)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    len_sat = F.least(F.lit(1.0), n_tokens.cast("double") / 64)
    score = F.round(
        0.3 * len_sat + 0.4 * F.least(F.lit(1.0), stop_ratio * 8) + 0.3 * ttr, 4
    )
    lang = (
        F.when(n_tokens == 0, "und")
        .when(stop_ratio >= 0.03, "en")
        .otherwise("und")
    )
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        lang.alias("lang_pred"),
        score.alias("quality_score"),
    )
