"""Checkpoint/resume: per-partition lineage + metrics (north rule)."""

import json
import shutil

from conftest import SF_DIR
from pfaedle_spark.plans.checkpoint import CheckpointedPipeline, checkpointed_flagship


def test_flagship_checkpoints_and_resumes(spark, tmp_path):
    root = str(tmp_path / "cp")

    tiles1, cp1 = checkpointed_flagship(spark, SF_DIR, root)
    n1 = tiles1.count()
    assert n1 > 0
    assert cp1.computed == ["points", "edges", "candidates", "viterbi", "tiles"]
    assert cp1.skipped == []

    # manifest: every stage complete, with lineage + per-partition stats
    entries = [json.loads(line) for line in open(f"{root}/MANIFEST.jsonl")]
    by_stage = {e["stage"]: e for e in entries}
    assert by_stage["candidates"]["inputs"] == ["points", "edges"]
    for e in entries:
        assert e["status"] == "complete"
        assert e["n_rows"] == sum(p["rows"] for p in e["partitions"])
        assert all(p["bytes"] > 0 for p in e["partitions"])

    # "kill + rerun": a fresh run resumes every stage from checkpoint
    tiles2, cp2 = checkpointed_flagship(spark, SF_DIR, root)
    assert cp2.computed == []
    assert cp2.skipped == ["points", "edges", "candidates", "viterbi", "tiles"]
    assert tiles2.count() == n1

    # partial failure: losing one mid-pipeline checkpoint recomputes it
    # and (lineage cascade) its downstream stages; upstream stays resumed
    shutil.rmtree(f"{root}/viterbi")
    tiles3, cp3 = checkpointed_flagship(spark, SF_DIR, root)
    assert cp3.computed == ["viterbi", "tiles"]
    assert cp3.skipped == ["points", "edges", "candidates"]
    assert tiles3.count() == n1


def test_invalidate_forces_recompute(spark, tmp_path):
    root = str(tmp_path / "cp2")
    cp = CheckpointedPipeline(spark, root)
    df = cp.stage("ten", lambda: spark.range(10).toDF("n"))
    assert df.count() == 10 and cp.computed == ["ten"]

    cp2 = CheckpointedPipeline(spark, root)
    cp2.invalidate("ten")
    cp2.stage("ten", lambda: spark.range(10).toDF("n"))
    assert cp2.computed == ["ten"]


def test_lifecycle_checkpoints_and_resumes(spark, tmp_path):
    """The composed §3.1 chain: graph build -> snap/splits -> collapse ->
    components -> candidates -> full Viterbi -> shapes -> GTFS sink,
    resumable at stage granularity; shapes rows survive the round trip."""
    import os

    from pfaedle_spark.plans.lifecycle import checkpointed_lifecycle

    root = str(tmp_path / "lc")
    shapes1, cp1 = checkpointed_lifecycle(spark, SF_DIR, root)
    n1 = shapes1.count()
    assert n1 > 0
    assert cp1.computed == [
        "snaps", "graph_nodes", "graph_edges", "components",
        "candidates", "viterbi", "shapes", "gtfs_shapes", "gtfs_feed",
    ]
    # the S5 sink wrote the COMPLETE fixed-name GTFS feed; shapes row
    # count matches the assembled result
    feed = os.path.join(root, "feed", "shapes.txt")
    with open(feed) as f:
        assert sum(1 for _ in f) == n1 + 1  # header
    from pfaedle_spark.sources import gtfs as _g

    for t in ["stops", "trips", "stop_times"] + _g.PASS_THROUGH:
        assert os.path.exists(os.path.join(root, "feed", f"{t}.txt")), t
    # pass-through fidelity end-to-end: the calendar a real feed carries
    # comes out of the lifecycle sink bit-identical
    cal_in = sorted(
        tuple(r)
        for r in _g.synthetic_feed(spark, SF_DIR)["calendar"].collect()
    )
    cal_out = sorted(
        tuple(r)
        for r in _g.read_table(spark, os.path.join(root, "feed"),
                               "calendar").collect()
    )
    assert cal_in == cal_out

    # kill + rerun: everything resumes, nothing recomputes — including
    # the feed sink (its own effect stage) and the transitions build
    # (deferred into the DP stage lambdas), so a clean resume is
    # metadata-only
    shapes2, cp2 = checkpointed_lifecycle(spark, SF_DIR, root)
    assert cp2.computed == [] and len(cp2.skipped) == 9
    assert "gtfs_feed" in cp2.skipped
    assert shapes2.count() == n1

    # losing the viterbi checkpoint recomputes only the DP tail; the
    # (expensive) graph-construction prefix stays resumed
    shutil.rmtree(f"{root}/viterbi")
    shapes3, cp3 = checkpointed_lifecycle(spark, SF_DIR, root)
    assert cp3.computed == ["viterbi", "shapes", "gtfs_shapes", "gtfs_feed"]
    assert set(cp3.skipped) == {
        "snaps", "graph_nodes", "graph_edges", "components", "candidates",
    }
    assert shapes3.count() == n1
