"""Custom stateful streaming operator: the CORE alignment DP (R7) over
a live candidate stream via ``applyInPandasWithState``.

Beyond-reference (the reference is a single-shot batch CLI): a
continuously-arriving observation feed wants trip alignment ON ARRIVAL.
The stateless half of the pipeline already streams
(``stream_tiles.stream_candidates`` — the J5 cell join with no state
store); this operator is the stateful half: candidate rows arrive in
any order across micro-batches, per-trip state accumulates the layers
seen so far, and every update re-emits the trip's CURRENT globally
optimal alignment over the accumulated prefix — an *online* Viterbi
whose last emission per trip equals the batch
``routing.viterbi_align`` answer exactly (parity-asserted in
tests/test_streaming.py).

Scale shape: state is keyed by trip_id (uniform, high-cardinality —
no hot keys); per-trip state is the trip's own candidate rows (tiny:
stops x top-k), NOT graph data — the road graph ships once per worker
as the same memoized CSR broadcast the batch path uses
(``routing.edges_broadcast``). Re-solving a trip costs O(layers x k^2)
on arrays already in memory, so per-batch work is proportional to the
batch's arrivals, never to the total state size.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.routing import (
    _ALIGN_SCHEMA,
    _viterbi_one_trip,
    csr_for_broadcast,
    edges_broadcast,
)

# accumulated candidate layers for one trip, column-major arrays
STATE_SCHEMA = (
    "seqs array<long>, image_ids array<string>, edge_ids array<long>, "
    "cand_nodes array<long>, dists array<double>"
)

_CAND_COLS = ["seq", "image_id", "edge_id", "cand_node", "dist"]


def stream_viterbi_align(
    cand_stream: DataFrame, edges_directed: DataFrame, level_punish: bool = True
) -> DataFrame:
    """Streaming R7 with explicit per-trip state.

    ``cand_stream`` must carry the batch candidate columns
    (trip_id, seq, image_id, edge_id, cand_node, dist); the selection
    (top-k rank) is assumed done upstream, mirroring the batch layering
    candidate_edges -> viterbi_align.
    """
    spark = cand_stream.sparkSession
    bc = edges_broadcast(spark, edges_directed)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seqs, image_ids, edge_ids, cand_nodes, dists = state.get
            acc = pd.DataFrame(
                {
                    "seq": list(seqs),
                    "image_id": list(image_ids),
                    "edge_id": list(edge_ids),
                    "cand_node": list(cand_nodes),
                    "dist": list(dists),
                }
            )
            parts = [acc]
        else:
            parts = []
        for pdf in pdfs:
            if len(pdf):
                parts.append(pdf[_CAND_COLS])
        merged = pd.concat(parts, ignore_index=True) if parts else None
        if merged is None or not len(merged):
            return
        # at-least-once sources may redeliver a row; the layer set is
        # keyed by (seq, edge_id), so dedup keeps re-solves idempotent
        merged = merged.drop_duplicates(["seq", "edge_id"], ignore_index=True)
        state.update(
            (
                [int(v) for v in merged["seq"]],
                [str(v) for v in merged["image_id"]],
                [int(v) for v in merged["edge_id"]],
                [int(v) for v in merged["cand_node"]],
                [float(v) for v in merged["dist"]],
            )
        )
        trip = merged.copy()
        trip["trip_id"] = key[0]
        csr = csr_for_broadcast(bc, level_punish=level_punish)
        yield _viterbi_one_trip(trip, csr)

    return cand_stream.groupBy("trip_id").applyInPandasWithState(
        update,
        outputStructType=_ALIGN_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_candidate_stream(
    spark, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(
        "trip_id string, seq long, image_id string, edge_id long, "
        "cand_node long, dist double"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)
