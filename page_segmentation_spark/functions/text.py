"""Text-analysis column functions for training-data pipelines.

First-class large-scale operators beyond the reference's own inventory
(per the build brief): language ID, quality scoring, token counting,
document fingerprinting — all pure ``pyspark.sql.functions`` column math
(JVM-side, codegen-friendly, no UDFs) with exact DuckDB-SQL twins used by
the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: language marker words (counted as ' word ' substrings of the padded,
#: lowered text — the n-gram heuristic's cheapest stable form).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "que", "es"],
}


def _marker_count(text: Column, word: str) -> Column:
    """Occurrences of ' word ' in the space-padded lowered text via the
    length-difference trick (portable to ANSI SQL)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def lang_score(text: Column, lang: str) -> Column:
    score = F.lit(0.0)
    for w in LANG_MARKERS[lang]:
        score = score + _marker_count(text, w)
    return score


def lang_id(text: Column) -> Column:
    """Argmax language with first-max tie-break over the fixed LANG order;
    'und' when no marker hits at all."""
    langs = list(LANG_MARKERS)
    scores = {lg: lang_score(text, lg) for lg in langs}
    best = scores[langs[0]]
    best_lang = F.lit(langs[0])
    for lg in langs[1:]:
        is_better = scores[lg] > best
        best_lang = F.when(is_better, F.lit(lg)).otherwise(best_lang)
        best = F.when(is_better, scores[lg]).otherwise(best)
    return F.when(best > 0.0, best_lang).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """Whitespace tokenization; 0 for empty/blank text."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish token estimate: words + punctuation marks counted as
    separate tokens (regexp-based, portable)."""
    words = token_count(text)
    punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[\.,;:!\?]", "")
    )
    return (words + punct).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length band + punctuation presence +
    alpha ratio — the training-data filter staple."""
    n = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    len_band = F.when((n >= 200.0) & (n <= 20000.0), 0.4).otherwise(
        F.when(n >= 50.0, 0.2).otherwise(0.0)
    )
    alpha_ratio = F.when(n > 0.0, n_alpha / n).otherwise(F.lit(0.0))
    punct_part = F.when(n_punct.cast("double") > 0.0, 0.2).otherwise(0.0)
    return len_band + punct_part + F.round(alpha_ratio * 0.4, 6)


def fingerprint(text: Column) -> Column:
    """64-bit hex document fingerprint over the whitespace-normalized
    lowered text (rolling-hash analog, stable under formatting noise)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, 16)


# ---- DuckDB-SQL twins (used by __spark_entry__.oracle_sql) -------------

def marker_count_sql(col: str, word: str) -> str:
    pad = f"(' ' || lower({col}) || ' ')"
    needle = f" {word} "
    return (
        f"((length({pad}) - length(replace({pad}, '{needle}', '')))"
        f" / {len(needle)})"
    )


def lang_score_sql(col: str, lang: str) -> str:
    return "(" + " + ".join(_as_dbl(marker_count_sql(col, w)) for w in LANG_MARKERS[lang]) + ")"


def _as_dbl(e: str) -> str:
    return f"CAST({e} AS DOUBLE)"
