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
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "h string, first_doc_id long, n_seen long"
STATE_SCHEMA = "n long, mn long"


def keyed_docs(docs: DataFrame) -> DataFrame:
    """(h, doc_id) — md5 content key, identical to batch exact_dedup."""
    return docs.select(F.md5(F.col("text")).alias("h"), "doc_id")


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, mn = state.get if state.exists else (0, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        m = int(pdf["doc_id"].min())
        mn = m if mn is None else min(mn, m)
    state.update((n, mn))
    yield pd.DataFrame({"h": [key[0]], "first_doc_id": [mn], "n_seen": [n]})


def stream_exact_dedup(keyed: DataFrame) -> DataFrame:
    """Streaming groupBy(content hash) with explicit per-key state."""
    return keyed.groupBy("h").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_doc_stream(spark, src_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)
