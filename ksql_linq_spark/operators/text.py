"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (per the build brief): language-ID
(stopword-hit heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + BPE-ish regex), and document fingerprinting.

All pure Column expressions over built-in functions — JVM-side,
codegen-friendly, no Python in the hot path; at 100 TB these run as a
single projection over the parquet scan (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword-hit
# language heuristic.  Deliberately tiny + deterministic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "en", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

_PUNCT_CLASS = "[.,!?;:]"
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
_BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tokens(text) -> Column:
    """Whitespace tokenization (empty-token free, both-ends trimmed)."""
    return F.filter(F.split(F.trim(_c(text)), "\\s+"), lambda t: t != "")


def token_count(text) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text) -> Column:
    """BPE-ish token count via regexp extraction (no vocab needed)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(_BPE_REGEX), F.lit(0)))


def stopword_hits(text, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(_c(text))), lambda t: t.isin(*sw)))


def stopword_ratio(text, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def punct_count(text) -> Column:
    c = _c(text)
    return F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))


def punct_ratio(text) -> Column:
    c = _c(text)
    return F.when(F.length(c) > 0, punct_count(c) / F.length(c)).otherwise(F.lit(0.0))


def mean_word_length(text) -> Column:
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.size(t),
    ).otherwise(F.lit(0.0))


def quality_score(text, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, low punct
    noise, natural stopword density, sane word lengths.  Mirrors the
    C4/Gopher-style rule-of-thumb filters from public LLM-data pipelines."""
    c = _c(text)
    length_ok = F.when((F.length(c) >= 100) & (F.length(c) <= 20000), 1.0).otherwise(0.25)
    punct_ok = F.when(punct_ratio(c) <= 0.1, 1.0).otherwise(0.5)
    sw = stopword_ratio(c, lang)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), 1.0).otherwise(0.5)
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.5)
    return (length_ok * punct_ok * sw_ok * mwl_ok).alias("quality")


def detect_language(text) -> Column:
    """Stopword-hit language heuristic: argmax of per-language hit counts,
    'und' (undetermined) when nothing hits.  One expression, no UDF."""
    c = F.lower(_c(text))
    toks = tokens(c)
    best = F.lit("und")
    best_hits = F.lit(0)

    def _hit(sw: list[str]):
        # NB: pyspark higher-order lambdas must be unary — capture via
        # closure, not default args (extra params get bound to Columns)
        return lambda t: t.isin(*sw)

    # fold over languages; greatest-hits wins, earlier language on ties
    for lang in STOPWORDS:
        hits = F.size(F.filter(toks, _hit(STOPWORDS[lang])))
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best


def normalize_text(text) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip punct."""
    c = F.lower(F.trim(_c(text)))
    c = F.regexp_replace(c, _PUNCT_CLASS, "")
    return F.regexp_replace(c, "\\s+", " ")


def fingerprint(text) -> Column:
    """Document fingerprint: md5 of normalized text (stable across engines)."""
    return F.md5(normalize_text(text))


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), the MinHash/Jaccard input.

    Built with sequence+transform over the token array — one projection,
    no explode until the caller wants one.
    """
    t = tokens(normalize_text(text))
    k = F.size(t) - (n - 1)
    return F.when(
        k > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(t, " ")))
