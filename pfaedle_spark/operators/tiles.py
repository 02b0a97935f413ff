"""Raster <-> vector tile payloads (north rule: "raster<->vector tiles
carry the decoded pixel payloads").

A tile is one grid cell (``cells.cell_id_col`` — the reference's
``Grid.h:269-280`` id). Two first-class tile representations, both
plain relational shapes:

* VECTOR tile (:func:`tile_vector`): one feature row per image in the
  tile — deterministic feature rank, in-tile offset geometry (dx, dy)
  and the caption attribute. Flat rows rather than nested arrays, so
  the DuckDB oracle compares them directly, and at scale the tile set
  is simply a (cell_id)-clustered table — no driver-side assembly.
* RASTER tile (:func:`tile_raster`): the tile rasterized to an R x R
  bin grid; each bin aggregates the DECODED image payloads landing in
  it — image count plus exact integer pixel sums produced by
  ``multimodal.decode_stats``, which reads the binary payload through
  the codec dispatch (Arrow-batched ``mapInPandas``). Bins are sparse
  (cell_id, px, py) rows: the whole rasterization is one narrow
  groupBy shuffle at any corpus size, and empty bins never exist.

Bin/offset math is pure integer arithmetic ((x % CELL) * R DIV CELL
on BIGINTs), so DuckDB reproduces every value bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C
from . import cells, multimodal

RASTER_R = 8
_CELL_I = int(C.CELL)
assert _CELL_I == C.CELL, "integer binning requires an integral cell size"


def tile_vector(images_xy: DataFrame) -> DataFrame:
    """Vector-tile feature rows from an image table carrying
    (doc_id, image_id, caption, x, y).

    Output: (cell_id, feat_rank, image_id, dx, dy, caption); feat_rank
    orders features by doc_id within the tile (deterministic across
    partitionings).
    """
    from pyspark.sql import Window

    t = cells.tile_assign(images_xy)
    w = Window.partitionBy("cell_id").orderBy("doc_id")
    return t.select(
        "cell_id",
        F.row_number().over(w).alias("feat_rank"),
        "image_id",
        F.expr(f"CAST(x AS BIGINT) % {_CELL_I}").alias("dx"),
        F.expr(f"CAST(y AS BIGINT) % {_CELL_I}").alias("dy"),
        "caption",
    )


def tile_raster(
    images_bytes: DataFrame, points_xy: DataFrame, r: int = RASTER_R
) -> DataFrame:
    """Rasterize tiles to an r x r grid of decoded-payload aggregates.

    ``images_bytes`` is the input_hint payload table (binary column
    included); ``points_xy`` carries (image_id, x, y). Each image's
    decoded pixel sums (the payload, through the codec path) land in
    the raster bin its coordinates fall into.

    Output: (cell_id, px, py, n_images, n_px, sum_px, mean_px) —
    integer exact counts/sums plus the bin's mean decoded intensity.
    """
    stats = multimodal.decode_stats(images_bytes).select(
        "image_id", "n_px", "sum_px"
    )
    binned = cells.tile_assign(points_xy).select(
        "cell_id",
        "image_id",
        F.expr(f"CAST(x AS BIGINT) % {_CELL_I} * {r} DIV {_CELL_I}").alias("px"),
        F.expr(f"CAST(y AS BIGINT) % {_CELL_I} * {r} DIV {_CELL_I}").alias("py"),
    )
    return (
        binned.join(stats, "image_id")
        .groupBy("cell_id", "px", "py")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("n_px").cast("long").alias("n_px"),
            F.sum("sum_px").cast("long").alias("sum_px"),
            (F.sum("sum_px").cast("double") / F.sum("n_px")).alias("mean_px"),
        )
    )


def raster_to_vector(raster: DataFrame, r: int = RASTER_R) -> DataFrame:
    """The raster->vector direction: every non-empty raster bin becomes
    a vector feature with its world-coordinate bbox geometry and the
    bin's payload aggregates as attributes.

    cell_id decomposes as ix * CELL_STRIDE + iy (Grid.h:269-280), so
    the bin bbox is pure integer arithmetic — no geometry library, one
    narrow projection, bit-exact in the oracle.

    Output: (cell_id, px, py, x0, y0, x1, y1, n_images, sum_px,
    mean_px).
    """
    assert _CELL_I % r == 0, "bin edges must land on integer coordinates"
    bin_w = _CELL_I // r
    stride = C.CELL_STRIDE
    return raster.select(
        "cell_id",
        "px",
        "py",
        F.expr(f"cell_id DIV {stride} * {_CELL_I} + px * {bin_w}").alias("x0"),
        F.expr(f"cell_id % {stride} * {_CELL_I} + py * {bin_w}").alias("y0"),
        F.expr(f"cell_id DIV {stride} * {_CELL_I} + (px + 1) * {bin_w}").alias("x1"),
        F.expr(f"cell_id % {stride} * {_CELL_I} + (py + 1) * {bin_w}").alias("y1"),
        "n_images",
        "sum_px",
        "mean_px",
    )


def tile_vector_sql() -> str:
    """DuckDB mirror: points CTE (x, y from phash) joined to documents
    for the caption, same cell id / offset / rank arithmetic."""
    from .. import sqlgen

    return f"""WITH {sqlgen.points_cte().lstrip()}
SELECT {sqlgen.cell_id('p.x', 'p.y')} AS cell_id,
       ROW_NUMBER() OVER (PARTITION BY {sqlgen.cell_id('p.x', 'p.y')}
                          ORDER BY p.doc_id) AS feat_rank,
       p.image_id,
       CAST(p.x AS BIGINT) % {_CELL_I} AS dx,
       CAST(p.y AS BIGINT) % {_CELL_I} AS dy,
       d.text AS caption
FROM points p JOIN documents d USING (doc_id)
"""


def tile_raster_sql(r: int = RASTER_R) -> str:
    """DuckDB mirror: per-image pixel sums recomputed from phash by the
    decode LCG (multimodal._images_px_cte), binned by the same integer
    arithmetic."""
    from .. import sqlgen

    return f"""WITH {multimodal._images_px_cte().lstrip()},
sums AS (
  SELECT image_id, COUNT(*)::BIGINT AS n_px, SUM(v)::BIGINT AS sum_px
  FROM px GROUP BY image_id
),{sqlgen.points_cte()}
SELECT {sqlgen.cell_id('p.x', 'p.y')} AS cell_id,
       (CAST(p.x AS BIGINT) % {_CELL_I}) * {r} // {_CELL_I} AS px,
       (CAST(p.y AS BIGINT) % {_CELL_I}) * {r} // {_CELL_I} AS py,
       COUNT(*)::BIGINT AS n_images,
       SUM(s.n_px)::BIGINT AS n_px,
       SUM(s.sum_px)::BIGINT AS sum_px,
       CAST(SUM(s.sum_px) AS DOUBLE) / SUM(s.n_px) AS mean_px
FROM points p JOIN sums s USING (image_id)
GROUP BY 1, 2, 3
"""


def raster_to_vector_sql(r: int = RASTER_R) -> str:
    bin_w = _CELL_I // r
    stride = C.CELL_STRIDE
    return f"""WITH rast AS (
{tile_raster_sql(r)})
SELECT cell_id, px, py,
       cell_id // {stride} * {_CELL_I} + px * {bin_w} AS x0,
       cell_id % {stride} * {_CELL_I} + py * {bin_w} AS y0,
       cell_id // {stride} * {_CELL_I} + (px + 1) * {bin_w} AS x1,
       cell_id % {stride} * {_CELL_I} + (py + 1) * {bin_w} AS y1,
       n_images, sum_px, mean_px
FROM rast
"""


# --------------------------------------------------------------------
# zoom pyramid — multi-level raster rollup
# --------------------------------------------------------------------

PYRAMID_LEVELS = 3  # zooms 0 (base) .. PYRAMID_LEVELS (coarsest)


def tile_pyramid(raster: DataFrame, r: int = RASTER_R, levels: int = PYRAMID_LEVELS) -> DataFrame:
    """Zoom pyramid over raster tiles: zoom z aggregates 2^z x 2^z base
    tiles into one, keeping the same r x r bin grid per tile (each
    parent bin absorbs a 2^z x 2^z block of base bins).

    Closed form from the GLOBAL base-bin coordinate
    ``g = tile_index * r + bin_index``: at zoom z the parent tile is
    ``g DIV (2^z * r)`` and the in-tile bin ``(g DIV 2^z) % r`` — so
    EVERY level is a direct key of the base row and the whole pyramid
    is ONE explode + ONE groupBy shuffle (map-side combinable) at any
    corpus size, not a per-level iteration. z = 0 reproduces the input
    bit-for-bit; payload sums are conserved per level (pytest-gated).

    Output: (zoom, cell_id, px, py, n_images, n_px, sum_px, mean_px).
    """
    stride = C.CELL_STRIDE
    g = raster.select(
        "*",
        F.expr(f"cell_id DIV {stride} * {r} + px").alias("gx"),
        F.expr(f"cell_id % {stride} * {r} + py").alias("gy"),
    ).select("*", F.explode(F.expr(f"sequence(0, {levels})")).alias("zoom"))
    s = "CAST(POW(2, zoom) AS BIGINT)"
    return (
        g.select(
            "zoom",
            F.expr(f"gx DIV ({s} * {r}) * {stride} + gy DIV ({s} * {r})").alias("cell_id"),
            F.expr(f"gx DIV {s} % {r}").alias("px"),
            F.expr(f"gy DIV {s} % {r}").alias("py"),
            "n_images", "n_px", "sum_px",
        )
        .groupBy("zoom", "cell_id", "px", "py")
        .agg(
            F.sum("n_images").cast("long").alias("n_images"),
            F.sum("n_px").cast("long").alias("n_px"),
            F.sum("sum_px").cast("long").alias("sum_px"),
            (F.sum("sum_px").cast("double") / F.sum("n_px")).alias("mean_px"),
        )
    )


def tile_pyramid_sql(r: int = RASTER_R, levels: int = PYRAMID_LEVELS) -> str:
    stride = C.CELL_STRIDE
    zooms = ",".join(f"({z})" for z in range(levels + 1))
    return f"""WITH rast AS (
{tile_raster_sql(r)}),
g AS (
  SELECT rast.*, z.zoom,
         cell_id // {stride} * {r} + px AS gx,
         cell_id % {stride} * {r} + py AS gy,
         CAST(POW(2, z.zoom) AS BIGINT) AS s
  FROM rast, (VALUES {zooms}) z(zoom)
)
SELECT zoom,
       gx // (s * {r}) * {stride} + gy // (s * {r}) AS cell_id,
       gx // s % {r} AS px,
       gy // s % {r} AS py,
       SUM(n_images)::BIGINT AS n_images,
       SUM(n_px)::BIGINT AS n_px,
       SUM(sum_px)::BIGINT AS sum_px,
       CAST(SUM(sum_px) AS DOUBLE) / SUM(n_px) AS mean_px
FROM g GROUP BY 1, 2, 3, 4
"""
