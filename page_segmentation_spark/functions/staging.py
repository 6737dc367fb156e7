"""Optimizer-barrier staging helpers.

The staged-column discipline (``with_lang_id`` docstring: referenced-many
aliases block CollapseProject inlining) protects PROJECTIONS, but not
FILTERS: ``PushDownPredicates`` substitutes aliases into a pushed
predicate unconditionally, so a ``.where()`` on a derived column is
re-expanded through every projection below it.  On the corpus funnel the
merged ``page_kept AND gopher-keep`` predicate re-computed the C4
line-filter chain (split + per-line regex) ~40x per row
(plans/r06/corpus_build_fused_before.txt node (3)).

:func:`pushdown_barrier` re-emits named columns through a one-element
``inline(array(struct(...)))`` Generate.  Predicates referencing
generator output are never pushed below the Generate, so each staged
column is computed exactly once and downstream filters test a plain
attribute.  Row set, values and schema are unchanged; the Generate is
whole-stage-codegen'd and adds no shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pushdown_barrier(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Turn ``cols`` into generator-output attributes (same names, same
    values, same row count) so no later ``.where()`` can be alias-
    substituted below this point.  Other columns pass through; column
    order is preserved."""
    cols = list(cols)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"pushdown_barrier: unknown columns {missing}")
    others = [c for c in df.columns if c not in cols]
    staged = F.inline(
        F.array(F.struct(*[F.col(c).alias(c) for c in cols]))
    )
    out = df.select(*others, staged)
    return out.select(*df.columns)
