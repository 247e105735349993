"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All built-in SQL expressions (JVM-side); the heuristics are simple and
deterministic by design so the DuckDB oracle reproduces them exactly.
These are the Spark-idiomatic analog of the reference's "custom CUDA
kernel" extension point (README.md:354-378): per-row compute fused
into whole-stage codegen instead of a hand-launched kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpu_olap_engine_spark.operators.dedup import base_hash, tokenize

FP_P = 2_147_483_647  # fingerprint modulus (2^31-1)

# Marker vocabularies for the n-gram language-ID heuristic. Tiebreaks
# resolve in this order (first wins).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "it", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
PUNCT_CLASS = "[.!?,;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokenize(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: word-piece regex splits on non-alnum and
    counts ~4-char chunks — a cheap, deterministic token estimator
    (the usual chars/4 heuristic, but per-word exact)."""
    words = tokenize(text)
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(F.regexp_replace(w, r"[^\p{L}\p{N}]", "")) / 4)
    )
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))


def marker_score(text: Column, markers: list[str]) -> Column:
    """How many tokens of `text` appear in the marker list (BIGINT)."""
    toks = tokenize(text)
    hits = F.filter(toks, lambda w: w.isin(*markers))
    return F.size(hits).cast("long")


def predict_lang(text: Column) -> Column:
    """Argmax over marker scores, ties resolved by LANG_MARKERS order."""
    scores = {lang: marker_score(text, m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front so earlier langs win ties.
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = (
                scores[lang] >= scores[other]
                if langs.index(other) > langs.index(lang)
                else scores[lang] > scores[other]
            )
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_features(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Components (all exact integer ratios -> IEEE doubles):
      stopword_ratio  — stopword tokens / tokens
      punct_ratio     — punctuation chars / chars
      len_score       — min(tokens, 100) / 100
    score = 0.5*stopword + 0.3*len + 0.2*(1 - punct)

    ``keep`` lists extra input columns carried through unchanged
    (e.g. a language label for per-language thresholds downstream).
    """
    text = F.col(text_col)
    toks = tokenize(text)
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).cast("long")
    n_chars = F.length(text).cast("long")
    n_punct = F.length(F.regexp_replace(text, f"[^{PUNCT_CLASS[1:-1]}]", "")).cast("long")
    stop_ratio = n_stop.cast("double") / n_tok
    punct_ratio = n_punct.cast("double") / n_chars
    len_score = F.least(n_tok, F.lit(100)).cast("double") / 100
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (0.5 * stop_ratio + 0.3 * len_score + 0.2 * (1 - punct_ratio)).alias(
            "quality_score"
        ),
    )


def fingerprint(text: Column) -> Column:
    """Position-sensitive 31-bit document fingerprint (BIGINT).

    fp = SUM_i ((hash(word_i) % P) * (i % 64 + 1) % P) % P — integer
    terms summed exactly (order-independent), so reordering words
    changes the value but execution order never does. A rolling-hash
    analog that distributes (unlike a true Rabin-Karp chain, which is
    sequential and would force a single-threaded pass)."""
    words = tokenize(text)
    terms = F.transform(
        words,
        lambda w, i: (base_hash(w) % FP_P) * (i % 64 + 1) % FP_P,
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)
    return (total % FP_P).cast("long")
