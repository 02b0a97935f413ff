"""W1-W3 — ordered-sequence (window) operators over trips.

Reference:
* W1 hop pairing — consecutive stop_times become hops
  (``shape_builder.cpp:628-648``, greedy loop ``router.cpp:317-347``).
* W2 cumulative distance along the sequence
  (``get_gtfs_shape`` ``shape_builder.cpp:380-526``).
* W3 missing-time interpolation proportional to cumulative cost
  (``set_shape`` ``shape_builder.cpp:337-378``).

All are single-shuffle window plans partitioned by trip_id — exactly
the partitioning the later Viterbi stage reuses, so Catalyst plans one
exchange for the whole per-trip section.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import sqlgen


def trip_hops(points: DataFrame) -> DataFrame:
    """(trip_id, seq) -> hop rows with straight-line length.

    Output: (trip_id, seq, image_id, next_image_id, x, y, nx, ny, hop_dist)
    — rows where next is NULL (trip end) are dropped, mirroring the
    reference's n-1 hops for n stops.
    """
    w = Window.partitionBy("trip_id").orderBy("seq")
    return (
        points.select("trip_id", "seq", "image_id", "x", "y")
        .withColumn("next_image_id", F.lead("image_id").over(w))
        .withColumn("nx", F.lead("x").over(w))
        .withColumn("ny", F.lead("y").over(w))
        .filter(F.col("next_image_id").isNotNull())
        .withColumn(
            "hop_dist",
            F.sqrt(
                (F.col("nx") - F.col("x")) * (F.col("nx") - F.col("x"))
                + (F.col("ny") - F.col("y")) * (F.col("ny") - F.col("y"))
            ),
        )
    )


def trip_hops_oracle_sql() -> str:
    return f"""{sqlgen.with_ctes("points")}
SELECT trip_id, seq, image_id,
       LEAD(image_id) OVER w AS next_image_id,
       x, y,
       LEAD(x) OVER w AS nx,
       LEAD(y) OVER w AS ny,
       SQRT((LEAD(x) OVER w - x)*(LEAD(x) OVER w - x)
          + (LEAD(y) OVER w - y)*(LEAD(y) OVER w - y)) AS hop_dist
FROM points
WINDOW w AS (PARTITION BY trip_id ORDER BY seq)
QUALIFY next_image_id IS NOT NULL
"""


def cumulative_dist(points: DataFrame) -> DataFrame:
    """Running distance along each trip (W2): cum_dist at stop k = sum of
    hop lengths up to k; first stop = 0."""
    w = Window.partitionBy("trip_id").orderBy("seq")
    prev_dx = F.col("x") - F.lag("x").over(w)
    prev_dy = F.col("y") - F.lag("y").over(w)
    step = F.coalesce(F.sqrt(prev_dx * prev_dx + prev_dy * prev_dy), F.lit(0.0))
    return (
        points.select("trip_id", "seq", "image_id", "x", "y")
        .withColumn("step_dist", step)
        .withColumn(
            "cum_dist",
            F.sum("step_dist").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )


def cumulative_dist_oracle_sql() -> str:
    return f"""{sqlgen.with_ctes("points")},
stepped AS (
  SELECT trip_id, seq, image_id, x, y,
         COALESCE(SQRT((x - LAG(x) OVER w)*(x - LAG(x) OVER w)
                     + (y - LAG(y) OVER w)*(y - LAG(y) OVER w)), 0.0) AS step_dist
  FROM points
  WINDOW w AS (PARTITION BY trip_id ORDER BY seq)
)
SELECT trip_id, seq, image_id, x, y, step_dist,
       SUM(step_dist) OVER (PARTITION BY trip_id ORDER BY seq
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dist
FROM stepped
"""


def interpolate_times(points: DataFrame, span_s: int = 3600) -> DataFrame:
    """W3: synthesize per-stop times by linear interpolation of a
    trip-level time span along cumulative distance (reference
    ``set_shape`` interpolates missing stop_times the same way)."""
    cd = cumulative_dist(points)
    w = Window.partitionBy("trip_id")
    total = F.max("cum_dist").over(w)
    frac = F.when(total > 0, F.col("cum_dist") / total).otherwise(F.lit(0.0))
    return cd.withColumn("arrival_s", F.round(frac * span_s).cast("long")).select(
        "trip_id", "seq", "image_id", "cum_dist", "arrival_s"
    )


def interpolate_times_oracle_sql(span_s: int = 3600) -> str:
    return f"""{sqlgen.with_ctes("points")},
stepped AS (
  SELECT trip_id, seq, image_id,
         COALESCE(SQRT((x - LAG(x) OVER w)*(x - LAG(x) OVER w)
                     + (y - LAG(y) OVER w)*(y - LAG(y) OVER w)), 0.0) AS step_dist
  FROM points WINDOW w AS (PARTITION BY trip_id ORDER BY seq)
),
cum AS (
  SELECT trip_id, seq, image_id,
         SUM(step_dist) OVER (PARTITION BY trip_id ORDER BY seq
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dist
  FROM stepped
)
SELECT trip_id, seq, image_id, cum_dist,
       CAST(ROUND(CASE WHEN MAX(cum_dist) OVER (PARTITION BY trip_id) > 0
                       THEN cum_dist / (MAX(cum_dist) OVER (PARTITION BY trip_id))
                       ELSE 0.0 END * {span_s}) AS BIGINT) AS arrival_s
FROM cum
"""
