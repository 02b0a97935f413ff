"""Image payload plumbing: decode, PSNR invariant, resize, frame plan.

The input_hint per-row invariant is checked end-to-end here:
decoded-pixel allclose for lossless formats, PSNR >= 40 dB for the
lossy format, caption equality through the tile join.
"""

import math

import numpy as np
import pyspark.sql.functions as F

from conftest import SF_DIR, assert_matches_oracle
from pfaedle_spark import datagen
from pfaedle_spark.operators import cells, multimodal


def _imgs(spark):
    return datagen.with_bytes(datagen.images(spark, SF_DIR))


# --- oracle parity (stats recomputed from phash in DuckDB) -----------

def test_decode_stats_oracle(spark):
    assert_matches_oracle(multimodal.decode_stats(_imgs(spark)), multimodal.decode_stats_sql())


def test_lossy_error_oracle(spark):
    assert_matches_oracle(multimodal.lossy_error(_imgs(spark)), multimodal.lossy_error_sql())


def test_resized_stats_oracle(spark):
    assert_matches_oracle(
        multimodal.resized_stats(_imgs(spark)), multimodal.resized_stats_sql()
    )


def test_frame_sample_oracle(spark):
    assert_matches_oracle(
        multimodal.frame_sample_plan(datagen.images(spark, SF_DIR)),
        multimodal.frame_sample_plan_sql(),
    )


# --- input_hint invariants -------------------------------------------

def test_lossless_roundtrip_allclose(spark):
    """raw/png payloads decode to EXACTLY the reference pixels."""
    rows = multimodal.lossy_error(_imgs(spark)).filter(F.col("fmt") != "rawz").collect()
    assert rows
    for r in rows:
        assert r.sum_err_sq == 0 and r.mse == 0.0


def test_lossy_psnr_at_least_40db(spark):
    rows = multimodal.lossy_error(_imgs(spark)).filter(F.col("fmt") == "rawz").collect()
    assert rows
    for r in rows:
        assert r.psnr_ok, f"{r.image_id}: mse={r.mse}"
        if r.mse > 0:
            psnr = 10 * math.log10(255.0 * 255.0 / r.mse)
            assert psnr >= multimodal.PSNR_MIN_DB


def test_caption_equality_through_tiles(spark):
    """Caption survives the tile join unchanged (north-rule invariant)."""
    docs = {r.doc_id: r.text for r in datagen.documents(spark, SF_DIR).collect()}
    tiles = cells.tile_assign(datagen.points(spark, SF_DIR)).select("image_id", "cell_id")
    joined = tiles.join(
        _imgs(spark).select("image_id", "caption"), "image_id"
    ).collect()
    assert len(joined) == len(docs)
    for r in joined:
        assert r.caption == docs[int(r.image_id.split("_")[1])]


def test_resize_pixels_match_numpy(spark):
    """The distributed resize equals the local numpy reference."""
    out = {
        r.image_id: (bytes(r.bytes), r.w, r.h)
        for r in multimodal.resize_nearest(_imgs(spark)).limit(2000).collect()
    }
    src = {r.image_id: r for r in _imgs(spark).collect()}
    assert set(out) == set(src)
    for iid, (b, w, h) in list(out.items())[:50]:
        s = src[iid]
        px = multimodal.decode_pixels(bytes(s.bytes), s.w, s.h, s.fmt)
        ys = (np.arange(h) * s.h) // h
        xs = (np.arange(w) * s.w) // w
        assert bytes(px[np.ix_(ys, xs)].tobytes()) == b


def test_frame_decode_is_gated(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_frame(b"", 4, 4, "h264", 0)
