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
