"""One-shot value-identity check for the r6 c4/gopher variant forms.

Compares the candidate implementations (rlike word-count + staged
lines/lower in c4; aggregate-over-words non_ws in gopher) against the
shipped forms, row-for-row, over (a) the real 30k-page extracted table
and (b) a hostile edge-case battery.  Prints PASS/FAIL counts; any
difference prints the offending rows.  Diagnostic only.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from page_segmentation_spark.session import get_spark  # noqa: E402
from page_segmentation_spark.functions.text import (  # noqa: E402
    c4_line_filter,
    gopher_quality,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXT = os.environ.get(
    "PSS_EXT_TABLE", "/tmp/pss_bench_cache/ext_n30000_seed42"
)

EDGES = [
    ("e01", ""),
    ("e02", " "),
    ("e03", "\t\t"),
    ("e04", "one two three four five."),
    ("e05", "one two three four."),
    ("e06", "  leading spaces one two three four five."),
    ("e07", "tab\tseparated words here now ok."),
    ("e08", "multi  spaces   between words five six."),
    ("e09", "ends with ellipsis one two three..."),
    ("e10", "no terminal punctuation five words here"),
    ("e11", 'quoted line with five words."'),
    ("e12", "javascript must be banned here today."),
    ("e13", "JavaScript mixed case banned word here."),
    ("e14", "lorem ipsum dolor sit amet consectetur."),
    ("e15", "curly brace { inside this page text."),
    ("e16", "line one is fine today ok.\nline two also fine today ok.\n"
            "line three is fine as well."),
    ("e17", "• bullet line one two three four.\n- dash bullet five six "
            "seven eight.\nnormal line with five words here."),
    ("e18", "word nbsp joined counts one two."),
    ("e19", "Unicode … ellipsis line one two…\nplain line with "
            "five words here."),
    ("e20", "a. b. c. d. e."),
    ("e21", "  \nonly blank lines\n   \n"),
    ("e22", "trailing spaces after period five words.   "),
    ("e23", "CRLF line one two three four.\r\nsecond line five six "
            "seven eight."),
    ("e24", "the be to of and that have with all stopwords here ok."),
    ("e25", "### symbols # everywhere # in # this # line # ok."),
    ("e26", ("w " * 60).strip() + "."),
    ("e27", "short."),
    ("e28", "中文 文本 cjk words one two three."),
]


def exp_c4_v2(ext, text_col="extracted_text"):
    from page_segmentation_spark.functions.text import C4_TERMINALS

    text = F.col(text_col)
    min_words, banned = 5, ("javascript",)

    def keep_line(l):
        t = F.rtrim(l)
        keep = F.substring(t, -1, 1).isin(*C4_TERMINALS)
        keep = keep & t.rlike(r"^ *(?:[^ ]+ +){%d}[^ ]" % (min_words - 1))
        low = F.lower(t)
        for w in banned:
            keep = keep & ~low.contains(w.lower())
        return keep

    df = ext.select(
        "*",
        F.split(text, "\n").alias("__lines"),
        F.lower(text).alias("__low"),
    )
    kept_expr = F.filter(F.col("__lines"), keep_line)
    staged = df.select("*", kept_expr.alias("__kept"))
    kept = F.col("__kept")
    page_bad = F.col("__low").contains("lorem ipsum") | F.col(
        "__low"
    ).contains("{")
    page_kept = (~page_bad) & (F.size(kept) >= 3)
    return staged.select(
        F.col("url"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(F.col("__lines")) - F.size(kept)).cast("long").alias(
            "n_removed"
        ),
        page_kept.cast("int").alias("page_kept"),
    )


def exp_gopher_v2(src, text_col="clean_text"):
    from page_segmentation_spark.functions.text import GOPHER_STOPWORDS

    text = F.col(text_col)
    df2 = src.select(
        "*",
        F.trim(text).alias("__pss_g_trim"),
        F.split(F.trim(text), r"\s+").alias("__pss_g_words"),
        F.split(text, "\n").alias("__pss_g_lines"),
        F.concat(F.lit(" "), F.lower(text), F.lit(" ")).alias(
            "__pss_g_padded"
        ),
    )
    blank = F.length(F.col("__pss_g_trim")) == 0
    words = F.col("__pss_g_words")
    n_words = F.when(blank, F.lit(0)).otherwise(F.size(words)).cast("long")
    non_ws = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_wl = F.when(n_words > 0, non_ws / n_words.cast("double")).otherwise(
        F.lit(0.0)
    )
    n_symbols = (
        F.size(F.regexp_extract_all(text, F.lit(r"#"), 0))
        + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0))
    ).cast("long")
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    lines = F.col("__pss_g_lines")
    n_lines = F.size(lines).cast("double")
    is_bullet = lambda l: (  # noqa: E731
        F.ltrim(l).startswith("•")
        | F.ltrim(l).startswith("- ")
        | F.ltrim(l).startswith("* ")
    )
    bullet_frac = F.size(F.filter(lines, is_bullet)).cast("double") / n_lines
    ends_ellipsis = lambda l: (  # noqa: E731
        F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…")
    )
    ellipsis_frac = (
        F.size(F.filter(lines, ends_ellipsis)).cast("double") / n_lines
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double")
    alpha_frac = F.when(
        n_words > 0, n_alpha_words / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    padded = F.col("__pss_g_padded")
    stop_hits = F.lit(0)
    for w in GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.when(
            padded.contains(f" {w} "), F.lit(1)
        ).otherwise(F.lit(0))
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.1)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df2.select(
        F.col("url"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
        keep.cast("int").alias("keep"),
    )


def check(name, a, b):
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    n = a.count()
    status = "PASS" if (d1 == 0 and d2 == 0) else "FAIL"
    print(f"{status} {name}: rows={n} a-b={d1} b-a={d2}", flush=True)
    if status == "FAIL":
        print("--- a minus b (sample):")
        a.exceptAll(b).show(10, truncate=120)
        print("--- b minus a (sample):")
        b.exceptAll(a).show(10, truncate=120)
    return status == "PASS"


def main():
    spark = get_spark(
        app="pss-verify-variants", master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    inputs = []
    if os.path.exists(os.path.join(EXT, "_SUCCESS")):
        inputs.append(("ext30k", spark.read.parquet(EXT)))
    edges = spark.createDataFrame(
        [(u, t) for u, t in EDGES], "url string, extracted_text string"
    )
    inputs.append(("edges", edges))

    for tag, df in inputs:
        cur_c4 = c4_line_filter(df, "url", "extracted_text")
        new_c4 = exp_c4_v2(df)
        ok &= check(f"c4/{tag}", cur_c4, new_c4)

        # gopher over the c4-survivor text (the funnel shape) and over
        # the RAW text (standalone use — exercises blank/odd inputs)
        surv = cur_c4.where(F.col("page_kept") == 1).select(
            "url", "clean_text"
        )
        cur_g = gopher_quality(surv, "url", "clean_text").select(
            "url", "n_words", "mean_word_len", "symbol_ratio",
            "bullet_frac", "ellipsis_frac", "alpha_frac", "n_stop_hits",
            "keep",
        )
        new_g = exp_gopher_v2(surv)
        ok &= check(f"gopher-surv/{tag}", cur_g, new_g)

        raw = df.select("url", F.col("extracted_text").alias("clean_text"))
        cur_g2 = gopher_quality(raw, "url", "clean_text").select(
            "url", "n_words", "mean_word_len", "symbol_ratio",
            "bullet_frac", "ellipsis_frac", "alpha_frac", "n_stop_hits",
            "keep",
        )
        new_g2 = exp_gopher_v2(raw)
        ok &= check(f"gopher-raw/{tag}", cur_g2, new_g2)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
