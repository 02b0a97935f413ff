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


# --- raster <-> vector tiles -----------------------------------------

def test_tile_vector_oracle(spark):
    from pfaedle_spark.operators import tiles

    imgs = datagen.images(spark, SF_DIR).select("doc_id", "image_id", "caption")
    pts = datagen.points(spark, SF_DIR).select("doc_id", "x", "y")
    assert_matches_oracle(tiles.tile_vector(imgs.join(pts, "doc_id")), tiles.tile_vector_sql())


def test_tile_raster_oracle(spark):
    from pfaedle_spark.operators import tiles

    pts = datagen.points(spark, SF_DIR).select("image_id", "x", "y")
    assert_matches_oracle(tiles.tile_raster(_imgs(spark), pts), tiles.tile_raster_sql())


def test_tile_roundtrip_conserves_payload(spark):
    """Every image appears exactly once as a vector feature, and the
    raster bins conserve the decoded pixel payload: summed bin pixels ==
    summed per-image decode_stats pixels (nothing dropped or re-binned
    twice anywhere in the tiling)."""
    from pfaedle_spark.operators import tiles

    imgs = datagen.images(spark, SF_DIR).select("doc_id", "image_id", "caption")
    pts = datagen.points(spark, SF_DIR)
    vec = tiles.tile_vector(imgs.join(pts.select("doc_id", "x", "y"), "doc_id"))
    n_imgs = imgs.count()
    assert vec.count() == n_imgs
    assert vec.select("image_id").distinct().count() == n_imgs

    ras = tiles.tile_raster(_imgs(spark), pts.select("image_id", "x", "y"))
    binned = ras.agg(
        F.sum("n_images").alias("n"), F.sum("sum_px").alias("s"), F.sum("n_px").alias("p")
    ).collect()[0]
    direct = (
        multimodal.decode_stats(_imgs(spark))
        .agg(F.sum("sum_px").alias("s"), F.sum("n_px").alias("p"))
        .collect()[0]
    )
    assert binned.n == n_imgs
    assert binned.s == direct.s and binned.p == direct.p


def test_raster_to_vector_bboxes_partition_the_points(spark):
    """raster->vector features carry world-coordinate bin bboxes; every
    source point falls inside EXACTLY one feature bbox (the bboxes tile
    the occupied space without overlap or gaps)."""
    from pfaedle_spark.operators import tiles

    pts = datagen.points(spark, SF_DIR).select("image_id", "x", "y")
    feats = tiles.raster_to_vector(tiles.tile_raster(_imgs(spark), pts))
    hits = pts.join(
        feats,
        (pts.x >= feats.x0) & (pts.x < feats.x1)
        & (pts.y >= feats.y0) & (pts.y < feats.y1),
    )
    assert hits.count() == pts.count()
    assert feats.agg(F.sum("n_images")).collect()[0][0] == pts.count()


def test_tile_pyramid_matches_oracle(spark):
    import __spark_entry__ as entrymod
    from conftest import assert_matches_oracle
    from pfaedle_spark.operators import tiles

    df = entrymod.queries()["tile_pyramid"](spark, SF_DIR)
    assert_matches_oracle(df, tiles.tile_pyramid_sql())


def test_tile_pyramid_conservation_and_identity(spark):
    """Payload sums are conserved at every zoom; zoom 0 == the base
    raster; each level has <= as many tiles as the level below."""
    import __spark_entry__ as entrymod
    from pfaedle_spark.operators import tiles

    base = entrymod.queries()["tile_raster"](spark, SF_DIR).toPandas()
    pyr = entrymod.queries()["tile_pyramid"](spark, SF_DIR).toPandas()
    tot = base["sum_px"].sum()
    for z, g in pyr.groupby("zoom"):
        assert g["sum_px"].sum() == tot, f"zoom {z} loses payload"
        assert g["n_images"].sum() == base["n_images"].sum()
    z0 = pyr[pyr["zoom"] == 0].drop(columns="zoom")
    key = ["cell_id", "px", "py"]
    a = base.sort_values(key, ignore_index=True)[sorted(z0.columns)]
    b = z0.sort_values(key, ignore_index=True)[sorted(z0.columns)]
    assert a.equals(b.astype(a.dtypes.to_dict()))
    ncells = pyr.groupby("zoom")["cell_id"].nunique()
    assert (ncells.diff().dropna() <= 0).all(), "pyramid must coarsen"
