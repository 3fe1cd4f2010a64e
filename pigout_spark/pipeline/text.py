"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-side column expressions (split / higher-order functions / regex)
— zero Python UDFs, so the layer rides whole-stage codegen and scales
with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pigout_spark.pipeline.dedup import ws_tokens

#: Small per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic.  Order = tie-break precedence.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "la", "y", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ein", "zu"],
    "zh": ["de", "he", "shi", "zai", "le", "you"],
}


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting three ways: whitespace tokens, alphabetic runs
    (a BPE-ish `[a-z]+` pre-tokenizer), and all BPE-ish pieces
    (alpha runs | digit runs | single other chars)."""
    return df.withColumns(
        {
            "n_ws_tokens": F.size(ws_tokens(text_col, distinct=False)).cast("long"),
            "n_alpha_runs": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+"), 0)
            ).cast("long"),
            "n_bpeish": F.size(
                F.regexp_extract_all(
                    F.col(text_col), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
                )
            ).cast("long"),
            "n_chars": F.length(text_col).cast("long"),
        }
    )


def _stop_count(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / distinctness / stopword-ratio features + a composite
    quality score in [0,1].  Ratios are int/int double divisions —
    deterministic across engines."""
    toks = ws_tokens(text_col, distinct=False)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    stop = _stop_count(toks, LANG_PROFILES["en"])
    out = df.withColumns(
        {
            "n_tokens": n.cast("long"),
            "n_distinct": F.size(F.array_distinct(toks)).cast("long"),
            "avg_token_len": sum_len / n,
            "stop_ratio": stop / n,
        }
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(32.0), F.lit(1.0)) * 0.5
        + (F.col("n_distinct") / F.col("n_tokens")) * 0.3
        + F.least(F.col("avg_token_len") / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality", score)


def lang_id(df: DataFrame, text_col: str = "text", out: str = "predicted") -> DataFrame:
    """Stopword-profile language ID: score = stopword hits per language,
    argmax with fixed precedence (LANG_PROFILES order) on ties."""
    toks = ws_tokens(text_col, distinct=False)
    scores = {lang: _stop_count(toks, words) for lang, words in LANG_PROFILES.items()}
    langs = list(LANG_PROFILES)
    pred = None
    for i, lang in enumerate(langs):
        rest = [scores[l] for l in langs[i + 1 :]]
        cond = (
            scores[lang] >= F.greatest(*rest) if len(rest) > 1
            else (scores[lang] >= rest[0]) if rest
            else F.lit(True)
        )
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return df.withColumn(out, pred)


#: modulus for the polynomial rolling hash (large prime < 2^31)
ROLLING_P = 1_000_000_007


def rolling_hash(text_col: Column | str, base: int = 31) -> Column:
    """Polynomial rolling hash over the characters:
    h = fold(c: h*base + ascii(c) mod P).  Left fold in exact int64 —
    engine-independent (SQL twin: list_reduce over split chars)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % ROLLING_P,
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    invariant to token order and repetition (near-exact dedup key)."""
    canon = F.array_join(F.array_sort(F.array_distinct(ws_tokens(text_col))), " ")
    return df.withColumn(out, F.md5(canon))
