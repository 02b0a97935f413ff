"""Structured Streaming tile assignment: batch/stream parity + windows."""

import shutil

import pyspark.sql.functions as F

from conftest import SF_DIR
from pfaedle_spark.streaming import stream_tiles as st


def _stage_events(spark, tmp_path):
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(src)
    return src


def test_stream_matches_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    tiled = st.stream_tiles(spark, src)
    rows = st.run_available_now(tiled, str(tmp_path / "cp"))
    got = {(r.event_id, r.cell_id) for r in rows}

    batch = st.assign_tiles(st.event_points(spark.read.parquet(src)))
    want = {(r.event_id, r.cell_id) for r in batch.collect()}
    assert got == want and len(got) == 1000


def test_windowed_counts_complete_mode(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    tiled = st.stream_tiles(spark, src)
    win = st.windowed_cell_counts(tiled, window="6 hours", watermark="1 hour")
    rows = st.run_available_now(win, str(tmp_path / "cp2"), mode="append")
    # batch equivalent
    batch = st.assign_tiles(st.event_points(spark.read.parquet(src)))
    want = {
        (r.cell_id, r.win["start"], r.win["end"]): r.n
        for r in batch.groupBy(
            "cell_id", F.window("ts", "6 hours").alias("win")
        ).agg(F.count("*").alias("n")).collect()
    }
    got = {(r.cell_id, r.win_start, r.win_end): r.n_events for r in rows}
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch count exactly
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stream_resume_from_checkpoint(spark, tmp_path):
    """Exactly-once file-source semantics: a second availableNow run on
    the same checkpoint emits nothing new."""
    src = _stage_events(spark, tmp_path)
    cp = str(tmp_path / "cp3")
    tiled = st.stream_tiles(spark, src)
    first = st.run_available_now(tiled, cp)
    assert len(first) == 1000
    again = st.run_available_now(st.stream_tiles(spark, src), cp)
    assert len(again) == 0


def test_stateful_stream_dedup_matches_batch(spark, tmp_path):
    """applyInPandasWithState exact-dedup: last emission per key ==
    batch groupBy(md5(text)) winner + count, across multiple
    micro-batches (maxFilesPerTrigger=2 forces state carry-over)."""
    from pfaedle_spark import datagen
    from pfaedle_spark.streaming import stream_dedup as sd

    src = str(tmp_path / "docs_src")
    datagen.dedup_corpus(spark, SF_DIR).repartition(6).write.parquet(src)

    stream = sd.stream_exact_dedup(
        sd.keyed_docs(sd.read_doc_stream(spark, src, max_files_per_trigger=2))
    )
    rows = st.run_available_now(stream, str(tmp_path / "cp_dedup"), mode="update")
    assert rows
    final = {}
    for r in rows:  # update mode: later emissions supersede earlier
        cur = final.get(r.h)
        if cur is None or r.n_seen > cur[1]:
            final[r.h] = (r.first_doc_id, r.n_seen)

    batch = (
        sd.keyed_docs(datagen.dedup_corpus(spark, SF_DIR))
        .groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.count("*").alias("n"))
        .collect()
    )
    want = {r.h: (r.mn, r.n) for r in batch}
    assert final == want
    # planted duplicates must actually exercise the state (n > 1 keys)
    assert any(n > 1 for _, n in final.values())


def test_stream_candidates_matches_batch(spark, tmp_path):
    """Streaming J5 (stream-static cell join) == the batch candidate
    join's pre-rank set on the same input: same (event, edge) pairs,
    same distances."""
    from pfaedle_spark import datagen
    from pfaedle_spark.operators import cells as cl
    from pfaedle_spark.operators.candidates import DIST_EXPR
    from pfaedle_spark import constants as C

    src = _stage_events(spark, tmp_path)
    eds = datagen.edges(spark)
    stream = st.stream_candidates(spark, src, eds)
    assert stream.isStreaming
    rows = st.run_available_now(stream, str(tmp_path / "cp_cand"))
    got = {(r.event_id, r.edge_id, round(r.dist, 9)) for r in rows}

    pts = st.event_points(spark.read.parquet(src))
    pc = cl.point_cells(pts.select("event_id", "x", "y"), C.SNAP_RADIUS)
    ec = cl.edge_cells(eds)
    batch = (
        pc.join(ec, "cell_id")
        .withColumn("dist", F.expr(DIST_EXPR))
        .filter(F.col("dist") <= C.SNAP_RADIUS)
    )
    want = {(r.event_id, r.edge_id, round(r.dist, 9)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stateful_stream_align_matches_batch(spark, tmp_path):
    """Streaming R7 (applyInPandasWithState online Viterbi): the LAST
    emission per trip across micro-batches == batch viterbi_align on
    the same candidates. maxFilesPerTrigger=2 over a 6-file source
    forces trips to be split across batches, so intermediate prefix
    alignments are re-solved from state and then superseded."""
    from pfaedle_spark import datagen
    from pfaedle_spark.operators import candidates as cd
    from pfaedle_spark.operators import graph_ops, routing
    from pfaedle_spark.streaming import stream_align as sa

    eds = datagen.edges(spark)
    bidir = graph_ops.write_odir_edges(eds)
    cand = cd.candidate_edges(datagen.points(spark, SF_DIR), eds).select(
        "trip_id", "seq", "image_id", "edge_id", "cand_node", "dist"
    )
    src = str(tmp_path / "cand_src")
    cand.repartition(6).write.parquet(src)

    stream = sa.stream_viterbi_align(
        sa.read_candidate_stream(spark, src, max_files_per_trigger=2), bidir
    )
    assert stream.isStreaming
    rows = st.run_available_now(stream, str(tmp_path / "cp_align"), mode="update")
    assert rows
    # update mode: the emission covering the most layers supersedes;
    # track per trip the run with the max layer count (ties: later wins)
    per_trip: dict = {}
    for r in rows:
        per_trip.setdefault(r.trip_id, []).append(r)
    # rows arrive batch-ordered within the drain; rebuild "last full
    # re-solve" per trip = the suffix with the largest seq coverage
    final = {}
    for t, rs in per_trip.items():
        # group emissions into solves: each solve emits one row per seq,
        # in seq order; the last solve is the final alignment
        solves = []
        cur = []
        last_seq = None
        for r in rs:
            if last_seq is not None and r.seq <= last_seq:
                solves.append(cur)
                cur = []
            cur.append(r)
            last_seq = r.seq
        solves.append(cur)
        final[t] = {
            (r.seq, r.image_id, r.edge_id, r.cand_node,
             round(r.emission, 9), round(r.acc_cost, 9))
            for r in solves[-1]
        }

    batch = routing.viterbi_align(
        cd.candidate_edges(datagen.points(spark, SF_DIR), eds), bidir
    ).collect()
    want: dict = {}
    for r in batch:
        want.setdefault(r.trip_id, set()).add(
            (r.seq, r.image_id, r.edge_id, r.cand_node,
             round(r.emission, 9), round(r.acc_cost, 9))
        )
    assert set(final) == set(want)
    assert final == want


def _write_trip_files(pdfs, src, tmp_path):
    """Write each pandas frame as its own parquet file with ascending
    mtimes so the file source processes them in order (one per trigger)."""
    import os
    import time as _time

    os.makedirs(src, exist_ok=True)
    base = _time.time() - 3600
    for i, pdf in enumerate(pdfs):
        p = os.path.join(src, f"f{i}.parquet")
        pdf.to_parquet(  # Spark reads us-precision timestamps, not ns
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (base + i * 10, base + i * 10))


def _state_rows(progress):
    """numRowsTotal of the (single) stateful operator in the LAST
    micro-batch that actually ran it."""
    rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    assert rows, "no stateful progress recorded"
    return rows[-1]


def test_stream_align_event_time_ttl_evicts_state(spark, tmp_path):
    """Bounded state: a trip whose candidates stop arriving for the TTL
    of event time is FINALIZED (its alignment re-emitted from stored
    state) and its state row evicted — the store ends holding only the
    in-flight trips, and every final answer still equals batch R7."""
    import pandas as pd

    from pfaedle_spark import datagen
    from pfaedle_spark.operators import candidates as cd
    from pfaedle_spark.operators import graph_ops, routing
    from pfaedle_spark.streaming import stream_align as sa

    eds = datagen.edges(spark)
    bidir = graph_ops.write_odir_edges(eds)
    cand = cd.candidate_edges(datagen.points(spark, SF_DIR), eds).select(
        "trip_id", "seq", "image_id", "edge_id", "cand_node", "dist"
    )
    trips = [r.trip_id for r in cand.select("trip_id").distinct().orderBy(
        "trip_id").limit(3).collect()]
    assert len(trips) == 3
    pdf = cand.filter(F.col("trip_id").isin(trips)).toPandas()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    files = []
    for i, t in enumerate(trips):  # one trip per file, 2h apart
        one = pdf[pdf["trip_id"] == t].copy()
        one["ts"] = t0 + pd.Timedelta(hours=2 * i)
        files.append(one)
    src = str(tmp_path / "cand_ttl_src")
    _write_trip_files(files, src, tmp_path)

    ttl_ms = 30 * 60 * 1000  # 30 min event time; trips arrive 2 h apart
    stream = sa.stream_viterbi_align(
        sa.read_candidate_stream(spark, src, max_files_per_trigger=1,
                                 with_ts=True),
        bidir,
        ttl_ms=ttl_ms,
    )
    progress: list = []
    rows = st.run_available_now(
        stream, str(tmp_path / "cp_ttl"), mode="update", progress_acc=progress
    )
    assert rows
    # trip 0 expired when trip 1's file advanced the watermark past
    # ts0 + TTL; trip 2's batch then evicted trip 1 the same way — only
    # the last trip's state survives the drain
    assert _state_rows(progress) == 1
    # the finalization re-emits the trip's alignment: trips 0 and 1 each
    # produce exactly two identical solves (arrival + finalization)
    per_trip: dict = {}
    for r in rows:
        per_trip.setdefault(r.trip_id, []).append(
            (r.seq, r.image_id, r.edge_id, r.cand_node,
             round(r.emission, 9), round(r.acc_cost, 9))
        )
    n_layers = {t: f["seq"].nunique() for t, f in zip(trips, files)}
    for t in trips[:2]:
        assert len(per_trip[t]) == 2 * n_layers[t]
        half = len(per_trip[t]) // 2
        assert sorted(per_trip[t][:half]) == sorted(per_trip[t][half:])
    assert len(per_trip[trips[2]]) == n_layers[trips[2]]
    # and every trip's final answer equals batch R7
    batch = routing.viterbi_align(
        cd.candidate_edges(datagen.points(spark, SF_DIR), eds).filter(
            F.col("trip_id").isin(trips)
        ),
        bidir,
    ).collect()
    want: dict = {}
    for r in batch:
        want.setdefault(r.trip_id, set()).add(
            (r.seq, r.image_id, r.edge_id, r.cand_node,
             round(r.emission, 9), round(r.acc_cost, 9))
        )
    got = {t: set(v) for t, v in per_trip.items()}
    assert got == want


def test_stream_dedup_event_time_ttl_evicts_state(spark, tmp_path):
    """Bounded dedup horizon: a content hash idle past the TTL is
    finalized (cumulative row re-emitted) and evicted; remaining keys
    stay exact."""
    import pandas as pd

    from pfaedle_spark.streaming import stream_dedup as sd

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    f1 = pd.DataFrame({"doc_id": [7, 3], "text": ["dup", "dup"],
                       "ts": [t0, t0]})
    f2 = pd.DataFrame({"doc_id": [10], "text": ["solo-b"],
                       "ts": [t0 + pd.Timedelta(hours=2)]})
    f3 = pd.DataFrame({"doc_id": [11], "text": ["solo-c"],
                       "ts": [t0 + pd.Timedelta(hours=4)]})
    src = str(tmp_path / "docs_ttl_src")
    _write_trip_files([f1, f2, f3], src, tmp_path)

    reader = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = sd.stream_exact_dedup(
        sd.keyed_docs(reader), ttl_ms=30 * 60 * 1000
    )
    progress: list = []
    rows = st.run_available_now(
        stream, str(tmp_path / "cp_dedup_ttl"), mode="update",
        progress_acc=progress,
    )
    # only the last file's hash survives in state
    assert _state_rows(progress) == 1
    by_h: dict = {}
    for r in rows:
        by_h.setdefault(r.h, []).append((r.first_doc_id, r.n_seen))
    assert len(by_h) == 3
    import hashlib

    h_dup = hashlib.md5(b"dup").hexdigest()
    # the duplicate pair: one arrival emission + one finalization, both
    # the exact cumulative answer (winner = min doc_id, n = 2)
    assert by_h[h_dup] == [(3, 2), (3, 2)]


def test_stream_align_resumes_from_state_store(spark, tmp_path):
    """North-rule resumability for the STATEFUL streaming operator: feed
    half the candidate files, stop the query, add the rest, restart
    with the SAME checkpoint dir — per-trip state survives the restart,
    so the final alignment still equals the batch answer over ALL data
    (trips split across the two runs are solved from restored state)."""
    import shutil

    from pfaedle_spark import datagen
    from pfaedle_spark.operators import candidates as cd
    from pfaedle_spark.operators import graph_ops, routing
    from pfaedle_spark.streaming import stream_align as sa

    eds = datagen.edges(spark)
    bidir = graph_ops.write_odir_edges(eds)
    cand = cd.candidate_edges(datagen.points(spark, SF_DIR), eds).select(
        "trip_id", "seq", "image_id", "edge_id", "cand_node", "dist"
    )
    staged = str(tmp_path / "staged")
    cand.repartition(6).write.parquet(staged)
    import os

    files = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    assert len(files) == 6
    src = str(tmp_path / "src")
    os.makedirs(src)
    cp = str(tmp_path / "cp_align_resume")

    def drain() -> list:
        stream = sa.stream_viterbi_align(sa.read_candidate_stream(spark, src), bidir)
        return st.run_available_now(stream, cp, mode="update")

    for f in files[:3]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    rows1 = drain()  # first run: partial data, state persisted
    for f in files[3:]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    rows2 = drain()  # RESTARTED query, same checkpoint: state restored
    assert rows1 and rows2

    # the last solve per trip across run 2 (or run 1 for trips fully
    # delivered early and untouched later) must equal the batch answer
    def last_solves(rows):
        per: dict = {}
        for r in rows:
            per.setdefault(r.trip_id, []).append(r)
        out = {}
        for t, rs in per.items():
            solves, cur, last_seq = [], [], None
            for r in rs:
                if last_seq is not None and r.seq <= last_seq:
                    solves.append(cur)
                    cur = []
                cur.append(r)
                last_seq = r.seq
            solves.append(cur)
            out[t] = {
                (r.seq, r.image_id, r.edge_id, r.cand_node,
                 round(r.emission, 9), round(r.acc_cost, 9))
                for r in solves[-1]
            }
        return out

    final = last_solves(rows1)
    final.update(last_solves(rows2))  # run-2 solves supersede

    batch = routing.viterbi_align(
        cd.candidate_edges(datagen.points(spark, SF_DIR), eds), bidir
    ).collect()
    want: dict = {}
    for r in batch:
        want.setdefault(r.trip_id, set()).add(
            (r.seq, r.image_id, r.edge_id, r.cand_node,
             round(r.emission, 9), round(r.acc_cost, 9))
        )
    assert final == want
