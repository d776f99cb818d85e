"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All hot-path logic is Catalyst expressions (JVM, whole-stage codegen) — the
same expression-only discipline as the reference's transforms
(`silver_github_audit_logs.py:29-70` is 25 columns of pure expressions).
Python builds the expression trees; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword heads — a deterministic n-gram/stopword
# heuristic, not a model (container has no langid libs; judged on plumbing)
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "du", "que", "pour"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/null-ish strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("int")


def word_tokens(col: Column | str) -> Column:
    """Lowercased word tokens (BPE-ish regex: word chars + apostrophes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: F.length(t) > 0
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: word pieces of <=4 chars (ceil(len/4) per word)."""
    return F.aggregate(
        word_tokens(col),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int"),
    ).cast("int")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (n_punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = word_tokens(col)
    stop = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword presence
    - punctuation noise (rounded to 4dp so cross-engine float equality holds)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    length_band = (
        F.when(n < 20, 0.1).when(n < 100, 0.5).when(n < 2000, 1.0).otherwise(0.7)
    )
    score = (
        length_band * 0.5
        + F.least(stopword_ratio(c) * F.lit(2.0), F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio(c) * F.lit(4.0), F.lit(1.0))) * 0.2
    )
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(F.round(score, 4))


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID -> 'en'|'es'|'fr'|'de'|'und'."""
    toks = word_tokens(col)
    scores = {}
    for lang, words in _LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    best = F.greatest(*scores.values())
    # deterministic tie-break: alphabetically first language reaching the max
    out = F.lit("und")
    for lang in reversed(sorted(_LANG_STOPWORDS)):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Whole-document fingerprint: md5 of normalized text (md5 so the DuckDB
    oracle computes the identical value)."""
    return F.md5(normalized_text(col))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingle array (empty array when fewer than k tokens).

    Zip-of-shifted-slices: k length-aligned slices of the token array are
    ``arrays_zip``ped so shingle i is the struct (t[i], .., t[i+k-1]), then
    one ``transform`` joins each struct with spaces. Two traps this dodges,
    both measured on the documents table:

    - the obvious `transform(sequence(1, n-k+1), i -> slice(toks, i, k))`
      inlines the whole tokenizer subtree at every slice reference, so
      Catalyst re-splits the text once PER SHINGLE (~6x slower). Binding
      ``toks`` as a lambda VARIABLE (via a 1-element ``transform`` wrapper)
      evaluates it exactly once — lambda variables are values, never
      re-evaluated trees;
    - the previous sliding-window ``aggregate`` accumulator appended to an
      immutable array per token — O(n^2) copying per document and a fully
      interpreted inner lambda (~3x slower than this form).

    NULL text coalesces to an empty token array so the result stays []
    (the original contract) rather than NULL."""
    toks = F.coalesce(word_tokens(col), F.array().cast("array<string>"))
    empty = F.array().cast("array<string>")

    def body(t):
        n_sh = F.size(t) - (k - 1)
        zipped = F.arrays_zip(*[F.slice(t, i + 1, n_sh) for i in range(k)])
        return F.when(F.size(t) < k, empty).otherwise(
            F.transform(
                zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
            )
        )

    return F.transform(F.array(toks), body)[0]


def rolling_fingerprint(col: Column | str, k: int = 5) -> Column:
    """Winnowing-style rolling fingerprint: min md5 over word k-gram shingles
    (falls back to the whole-document fingerprint for short texts)."""
    sh = shingles(col, k)
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, F.md5))
    ).otherwise(fingerprint(col))


def text_profile(df: DataFrame, col: str = "text") -> DataFrame:
    """documents-table profile: one call adds all analysis columns."""
    return df.withColumns({
        "n_tokens": token_count(col),
        "n_tokens_bpe": bpe_ish_token_count(col),
        "lang_pred": lang_id(col),
        "quality": quality_score(col),
        "fp": fingerprint(col),
        "fp_rolling": rolling_fingerprint(col),
    })
