"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is built-in column expressions (codegen'd, SQL-expressible
for the DuckDB oracle) — these run inside the 100 TB scan, so no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists — an n-gram/stopword-ratio heuristic,
# not a model (the container has no langid/fasttext; a real classifier slots
# in as a pandas UDF with this exact signature).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "pt": ("o", "a", "de", "e", "que", "em", "um", "para", "com", "os"),
    "de": ("der", "die", "das", "und", "zu", "ist", "ein", "mit", "von", "den"),
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: F.length(t) > 0)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = _tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def detect_language(col: Column) -> Column:
    """argmax of per-language stopword ratios; 'und' when nothing matches."""
    scores = [(lang, stopword_ratio(col, lang)) for lang in STOPWORDS]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + single punctuation
    (a cheap proxy for subword tokenizers' pre-tokenization)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)).cast("long")


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features (Gopher/C4-style cheap filters):
    length, mean word length, punctuation ratio, stopword ratio,
    alpha ratio, and a composite [0,1] quality score."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(toks).cast("long")
    mean_word_len = F.round(
        n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 4
    )
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 4)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    alpha_ratio = F.round(alpha / F.greatest(n_chars, F.lit(1)), 4)
    sw_ratio = F.round(stopword_ratio(t), 4)
    # rounded to 6, not 4: the score is an exact multiple of 0.000025 (sum of
    # products of scale-4 inputs), so scale-4 rounding sits exactly on decimal
    # ties where Spark (BigDecimal half-up on the double's exact expansion)
    # and other engines (scaled-double rounding) disagree; at scale 6 the
    # value terminates and no tie exists.
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.25)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.25).otherwise(0.0)
        + F.least(sw_ratio * 5, F.lit(1.0)) * F.lit(0.25)
        + alpha_ratio * F.lit(0.25),
        6,
    )
    return docs.select(
        "*",
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        sw_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over normalized tokens,
    base 31 mod 2^31-1 — order-sensitive (unlike a bag-of-words hash), cheap,
    SQL-reproducible, and overflow-safe under ANSI mode (acc*31 + h stays
    well under 2^63 because acc < 2^31 and h < 2^32)."""
    MOD = (1 << 31) - 1
    toks = _tokens(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""))
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        tok_hash,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(31) + h, F.lit(MOD)),
    )
