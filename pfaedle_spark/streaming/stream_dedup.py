"""Custom stateful streaming operator: exact dedup over a document
stream via ``applyInPandasWithState``.

Beyond-reference (the reference is a batch CLI): the training-data
ingest path needs dedup ON ARRIVAL — the batch ``dedup.exact_dedup``
semantics (group by content hash, winner = min doc_id, count members)
maintained incrementally in the state store.

Scale shape: state is keyed by the content hash (md5 — uniform, no hot
keys); per-key state is two longs, so the store stays tiny relative to
the stream. Output mode "update": each micro-batch re-emits the keys it
touched with their cumulative (winner, n_seen) — the LAST emission per
key equals the batch answer, which is exactly what the parity test
asserts.

State LIFETIME is bounded by an event-time TTL (``ttl_ms``): a content
hash not seen again within ``ttl_ms`` of event time is finalized (its
cumulative row re-emitted once) and evicted, so the store holds only
the recent-dedup horizon, not every hash ever ingested. A duplicate
arriving after eviction restarts its count — the standard
bounded-memory dedup-window contract. ``ttl_ms=None`` keeps exact
unbounded dedup for bounded feeds.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "h string, first_doc_id long, n_seen long"
STATE_SCHEMA = "n long, mn long, max_ts long"


def keyed_docs(docs: DataFrame) -> DataFrame:
    """(h, doc_id[, ts]) — md5 content key, identical to batch
    exact_dedup; carries the event-time column through when present."""
    cols = [F.md5(F.col("text")).alias("h"), F.col("doc_id")]
    if "ts" in docs.columns:
        cols.append(F.col("ts"))
    return docs.select(*cols)


def stream_exact_dedup(
    keyed: DataFrame,
    ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming groupBy(content hash) with explicit per-key state.

    With ``ttl_ms`` set, ``keyed`` must carry an event-time ``ts``
    column; hashes idle for ``ttl_ms`` of event time are finalized and
    evicted from the state store.
    """
    if ttl_ms is not None:
        keyed = keyed.withWatermark("ts", watermark_delay)

    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            n, mn, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {"h": [key[0]], "first_doc_id": [mn], "n_seen": [n]}
            )
            return
        n, mn, max_ts = state.get if state.exists else (0, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            mn = m if mn is None else min(mn, m)
            if ttl_ms is not None:
                max_ts = max(max_ts, int(pdf["ts"].max().value // 10**6))
        state.update((n, mn, max_ts))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(
                max(max_ts + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame({"h": [key[0]], "first_doc_id": [mn], "n_seen": [n]})

    return keyed.groupBy("h").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def read_doc_stream(spark, src_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)
