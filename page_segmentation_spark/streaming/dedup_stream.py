"""Stateful streaming dedup: first-seen filter over a continuous crawl.

The streaming twin of :func:`operators.dedup.exact_dedup` — a crawl
stream re-delivers the same page content across hours or days, and batch
dedup can only run after the fact.  This operator keeps per-content-hash
state across micro-batches (``applyInPandasWithState``) and emits each
normalized content exactly once, on first sight:

  * key      — md5 of the normalized text (the exact_dedup key);
  * state    — (n_seen,) running duplicate count (RocksDB/HDFS state
    store in production);
  * output   — one row per NEW content hash with a deterministic
    representative (min url within the discovering micro-batch).

Late/repeat deliveries only bump the state counter — no output, so an
append sink stays exactly-once.

State sizing and eviction
-------------------------
With no horizon the state holds one entry per distinct content hash
seen, ever.  An entry is ~50 B on disk in the RocksDB provider (16 B
md5 key + one long + store overhead), so 10^12 *distinct* documents is
~50 TB of state — partitionable across executors (state is keyed by the
shuffle partition of ``content_hash``) but unbounded over time.  Two
production levers:

  * ``dedup_horizon_s=N`` — event-time TTL eviction (implemented here):
    a key's state is dropped once the watermark passes ``last_seen +
    horizon``, so state size is bounded by the distinct-content count
    inside a sliding event-time window.  The trade is explicit and
    standard for crawl dedup: a content re-delivered more than the
    horizon after its last sighting re-emits (dedup within a horizon,
    not forever).  Re-arrival before expiry slides the window
    (timeout timestamp refreshes on every sighting).
  * no horizon (default) — exact forever-dedup; cap state by
    partitioning keys over time buckets at the source if the content
    universe is unbounded.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, first_url string, dup_in_batch long"
STATE_SCHEMA = "n_seen long"

_EPOCH = pd.Timestamp(0, tz="UTC")


def _make_first_seen_fn(horizon_s: int | None):
    """Build the per-key state function; ``horizon_s`` enables event-time
    eviction (None = permanent state, no timeouts ever fire)."""

    def _first_seen_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_seen + horizon: evict. The content
            # hash is re-admitted (re-emits) if it ever returns.
            state.remove()
            return iter(())
        batch = pd.concat(list(pdfs), ignore_index=True)
        n = len(batch)
        if horizon_s is not None:
            # slide the eviction window to the newest sighting
            last_ms = int(
                (batch["warc_ts"].max().tz_localize("UTC") - _EPOCH)
                // pd.Timedelta(milliseconds=1)
            )
            state.setTimeoutTimestamp(last_ms + horizon_s * 1000)
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

    return _first_seen_fn


def first_seen_stream(
    pages: DataFrame,
    text_col: str = "text",
    dedup_horizon_s: int | None = None,
    late_tolerance: str = "0 seconds",
) -> DataFrame:
    """(streaming) pages -> one row per first-seen normalized content.

    Feed a ``readStream`` DataFrame; write with ``outputMode("update")``
    (emissions are one-shot, so append-semantics hold at the sink).

    ``dedup_horizon_s`` bounds state: a content hash unseen for that many
    event-time seconds (per ``warc_ts`` watermark) is evicted and will
    re-emit on return.  ``late_tolerance`` is the watermark delay for
    out-of-order ``warc_ts`` values (only used with a horizon)."""
    cols = [
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        ).alias("content_hash"),
        "url",
    ]
    if dedup_horizon_s is None:
        hashed = pages.select(*cols)
        timeout = GroupStateTimeout.NoTimeout
    else:
        hashed = pages.withWatermark("warc_ts", late_tolerance).select(
            *cols, "warc_ts"
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _make_first_seen_fn(dedup_horizon_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
