"""Stateful streaming dedup: first-seen filter over a continuous crawl.

The streaming twin of :func:`operators.dedup.exact_dedup` — a crawl
stream re-delivers the same page content across hours or days, and batch
dedup can only run after the fact.  This operator keeps per-content-hash
state across micro-batches (``applyInPandasWithState``) and emits each
normalized content exactly once, on first sight:

  * key      — md5 of the normalized text (the exact_dedup key);
  * state    — (n_seen,) running duplicate count (RocksDB/HDFS state
    store in production — state size is #distinct contents, the same
    cardinality the batch hash-agg shuffles);
  * output   — one row per NEW content hash with a deterministic
    representative (min url within the discovering micro-batch).

Late/repeat deliveries only bump the state counter — no output, so an
append sink stays exactly-once.  No timeout is set: dedup state is
permanent by definition (expiry would re-admit old duplicates); cap it
in production by partitioning state over time-bucketed keys if the
content universe is unbounded.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, first_url string, dup_in_batch long"
STATE_SCHEMA = "n_seen long"


def _first_seen_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    n = len(batch)
    if state.exists:
        (n_seen,) = state.get
        state.update((n_seen + n,))
        return iter(())
    state.update((n,))
    return iter(
        [
            pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "first_url": [batch["url"].min()],
                    "dup_in_batch": [n],
                }
            )
        ]
    )


def first_seen_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(streaming) pages -> one row per first-seen normalized content.

    Feed a ``readStream`` DataFrame; write with ``outputMode("update")``
    (emissions are one-shot, so append-semantics hold at the sink)."""
    hashed = pages.select(
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        ).alias("content_hash"),
        "url",
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
