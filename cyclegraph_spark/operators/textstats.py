"""Text analysis operators for large-scale corpus pipelines — language
ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; no UDF). The scalar
surface mirrors the reference's string/regex normalization family
(SURVEY.md §2.7: lower/trim key normalization cli/session.py:1202-1204,
regex numeric extraction :1271-1291, keyword classification
core/src/physics.rs:446-507, safe-slug trend9.py:267).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language — a deterministic n-gram-style heuristic
# (the keyword→class table idiom of physics.rs:446-507, as a lang table)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "no": ("og", "det", "som", "en", "ikke"),
}


def tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def marker_score(text_col: Column, lang: str) -> Column:
    """Count of marker-word hits (word-boundary regex, case-insensitive)."""
    pat = r"(?i)\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(text_col, F.lit(pat))


def lang_id(text_col: Column) -> Column:
    """argmax over marker scores; deterministic tie-break = language code
    order; 'und' when every score is 0."""
    scores = [(lang, marker_score(text_col, lang)) for lang in sorted(LANG_MARKERS)]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in REVERSE code order so earlier codes win ties
    for lang, score in reversed(scores):
        take = score > F.lit(0)
        better = score >= best_score  # later-assigned (earlier code) wins ties
        best_lang = F.when(take & better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take & better, score).otherwise(best_score)
    return best_lang


def quality_features(text_col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword ratio features (quality scoring for a
    training-data pipeline; A19 estimated-error heuristic analog)."""
    n_chars = F.length(text_col)
    n_tokens = token_count(text_col)
    n_punct = F.regexp_count(text_col, F.lit(r"[.,;:!?]"))
    n_upper = F.regexp_count(text_col, F.lit(r"[A-Z]"))
    n_stop = marker_score(text_col, "en")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": n_chars.cast("double") / safe_tokens,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "upper_ratio": n_upper.cast("double") / safe_chars,
        "stopword_ratio": n_stop.cast("double") / safe_tokens,
    }


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality score — multiplicative penalty chain, the
    reference's weather-adjustment idiom (core/src/metrics.rs:19-28)."""
    f = quality_features(text_col)
    base = F.lit(1.0)
    score = (
        base
        * F.when(f["n_tokens"] < 10, 0.5).otherwise(1.0)
        * F.when(f["avg_token_len"] > 12, 0.8).otherwise(1.0)
        * F.when(f["punct_ratio"] > 0.1, 0.9).otherwise(1.0)
        * F.when(f["stopword_ratio"] < 0.01, 0.85).otherwise(1.0)
    )
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


def fingerprint(text_col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text (final14.py sha256-manifest
    idiom applied per document)."""
    norm = F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")
    return F.md5(norm)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    feats = quality_features(c)
    out = df
    for name, col in feats.items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("lang_pred", lang_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", fingerprint(c))
    )


# --------------------------------------------------------------------------
# PII scrubbing — regex surface chosen to behave identically under Java
# regex (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround
# --------------------------------------------------------------------------
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d().\-\s]{6,}\d", "[PHONE]"),
)


def redact_pii(text_col: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholders. Order matters: emails first (they contain dots
    and digits that the later patterns would shred), then IPs, then the
    greedy phone pattern over what remains."""
    out = text_col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-kind match counts, each computed on the text with the EARLIER
    kinds already redacted — otherwise the greedy phone pattern would
    also count every IPv4 (dotted digit runs match it)."""
    out: dict[str, Column] = {}
    cur = text_col
    for kind, pat, repl in PII_PATTERNS:
        out[f"n_{kind}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return out
