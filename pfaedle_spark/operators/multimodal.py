"""Multimodal (image) payload operators — the input_hint surface.

The payload table is ``(image_id, bytes binary, w, h, fmt, caption,
phash)`` (BASELINE.json input_hint). Images are opaque binary columns
with typed metadata; decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` UDFs whose inner math is numpy over each
image's pixel buffer (vectorized per image; the only Python-level loop
is over the rows of one Arrow batch — payloads have variable length,
so a per-row ``frombuffer`` view is unavoidable and free).

Codec gating: ``raw``/``rawz`` decode with numpy only. ``png`` would
need a real codec (PIL/cv2 are not in this container) — the import is
try-gated; without it the deterministic fallback interprets the stored
payload as raw pixels (which is exactly how datagen stubs png bytes),
so the pipeline plumbing (schema, batching, partitioning) is fully
exercised and the swap-in point for the real codec is one function.

Oracle story: the pixel generator is an integer LCG on ``phash``
(datagen.gen_pixels), so DuckDB can recompute per-image pixel
statistics and lossy-error MSE from ``phash`` alone — the SQL oracle
checks the full produce->binary->decode round trip bit-exactly without
ever seeing the bytes. PSNR thresholds are compared on exact rational
MSE (no transcendentals cross-engine).

Video/audio frame-sampling is a schema-true stub: deterministic frame
index selection is real, frame *decoding* raises NotImplementedError
until a codec is present.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datagen import gen_pixels

try:  # real PNG codec not shipped in this container — gated
    from PIL import Image as _PIL_Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

# LCG constants shared with datagen.gen_pixels and the SQL oracle
LCG_INC = 2654435761
LCG_MULT = 1103515245
LCG_ADD = 12345
M32 = 4294967295
RAWZ_SHIFT = 2
PSNR_MIN_DB = 40.0
# PSNR >= 40 dB  <=>  MSE <= 255^2 / 10^4
MSE_MAX = 255.0 * 255.0 / 10_000.0


def decode_pixels(b: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """binary -> (h, w) uint8 array. The codec dispatch point."""
    if fmt in ("raw", "rawz"):
        return np.frombuffer(b, dtype=np.uint8).reshape(h, w)
    if fmt == "png":
        if HAVE_PIL:  # pragma: no cover - codec not in container
            import io

            return np.asarray(_PIL_Image.open(io.BytesIO(b)).convert("L"))
        # deterministic fallback: datagen stubs png payloads as raw pixels
        return np.frombuffer(b, dtype=np.uint8).reshape(h, w)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available")


def decode_stats(images_bytes: DataFrame) -> DataFrame:
    """Per-image pixel statistics from the DECODED binary payload.

    Output: (image_id, fmt, n_px, sum_px, sum_sq, mean_px, var_px).
    mean/var are exact-integer ratios => bit-identical to the SQL
    oracle that recomputes them from phash.
    """
    schema = (
        "image_id string, fmt string, n_px long, sum_px long, sum_sq long, "
        "mean_px double, var_px double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, b, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_pixels(b, int(w), int(h), fmt).astype(np.int64)
                n = px.size
                s = int(px.sum())
                s2 = int((px * px).sum())
                out.append(
                    (iid, fmt, n, s, s2, s / n, (n * s2 - s * s) / (n * n))
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "fmt", "n_px", "sum_px", "sum_sq", "mean_px", "var_px"],
            )

    return images_bytes.mapInPandas(gen, schema=schema)


def lossy_error(images_bytes: DataFrame) -> DataFrame:
    """Decoded payload vs reference pixels: exact MSE + PSNR gate.

    Output: (image_id, fmt, sum_err_sq, mse, psnr_ok). The reference
    pixels are regenerated from phash (the ground truth the payload was
    produced from), so this IS the input_hint invariant: raw/png ->
    mse = 0 (allclose), rawz -> mse <= 6.5025 (PSNR >= 40 dB).
    """
    schema = "image_id string, fmt string, sum_err_sq long, mse double, psnr_ok boolean"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, b, w, h, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]
            ):
                got = decode_pixels(b, int(w), int(h), fmt).astype(np.int64)
                ref = gen_pixels(int(ph), int(w), int(h)).astype(np.int64)
                e2 = int(((got - ref) ** 2).sum())
                mse = e2 / got.size
                out.append((iid, fmt, e2, mse, mse <= MSE_MAX))
            yield pd.DataFrame(
                out, columns=["image_id", "fmt", "sum_err_sq", "mse", "psnr_ok"]
            )

    return images_bytes.mapInPandas(gen, schema=schema)


def resize_nearest(images_bytes: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize (numpy index grid), new payload bytes.

    Output keeps the input_hint schema shape with fmt='raw'.
    """
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b, w, h, fmt, cap, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"], pdf["caption"], pdf["phash"],
            ):
                px = decode_pixels(b, int(w), int(h), fmt)
                ys = (np.arange(out_h) * int(h)) // out_h
                xs = (np.arange(out_w) * int(w)) // out_w
                small = px[np.ix_(ys, xs)]
                rows.append((iid, small.tobytes(), out_w, out_h, "raw", cap, int(ph)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return images_bytes.mapInPandas(gen, schema=schema)


def resized_stats(images_bytes: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Oracle-checkable projection of the resize: pixel sums of the
    resized payload (DuckDB recomputes the same index grid from phash)."""
    return decode_stats(resize_nearest(images_bytes, out_w, out_h)).select(
        "image_id", "n_px", "sum_px", "mean_px"
    )


def frame_sample_plan(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-index sampling for (stub) video payloads:
    treats each image row as an n_frames=h clip, picks every n-th frame
    index. Real frame DECODE is gated behind a codec
    (NotImplementedError) — the plan/schema/partitioning is the part a
    cluster job needs, and it is fully testable."""
    seq = F.sequence(F.lit(0), F.col("h") - 1, F.lit(every_n))
    return videos.select(
        "image_id",
        F.col("h").cast("long").alias("n_frames"),
        F.concat_ws(",", seq.cast("array<string>")).alias("frame_idx_csv"),
        F.size(seq).alias("n_sampled"),
    )


def decode_frame(b: bytes, w: int, h: int, fmt: str, frame: int) -> np.ndarray:
    """Stub: real video codecs are not in this container."""
    raise NotImplementedError("video frame decoding requires a codec (gated)")


# --------------------------------------------------------------------
# SQL oracles: recompute pixel stats from phash via the integer LCG
# --------------------------------------------------------------------

def _images_px_cte(quantize_rawz: bool = True) -> str:
    """CTE ``px``: one row per (image, pixel) with the decoded value,
    regenerated from phash by the same LCG as datagen.gen_pixels."""
    q = (
        f"CASE WHEN fmt = 'rawz' THEN (p.v >> {RAWZ_SHIFT}) << {RAWZ_SHIFT} "
        "ELSE p.v END"
        if quantize_rawz
        else "p.v"
    )
    return f"""
imgs AS (
  SELECT 'img_' || CAST(doc_id AS VARCHAR) AS image_id,
         CAST(16 + doc_id % 17 AS INT) AS w,
         CAST(16 + doc_id % 13 AS INT) AS h,
         CASE doc_id % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'png' ELSE 'rawz' END AS fmt,
         ((doc_id * 2654435761) % 4611686018427387904) AS phash
  FROM documents
),
px AS (
  SELECT image_id, fmt, {q} AS v
  FROM (
    SELECT image_id, fmt,
           UNNEST(LIST_TRANSFORM(RANGE(0, w * h), i ->
             ((((((phash % 2147483648) + i * {LCG_INC}) & {M32})
                * {LCG_MULT} + {LCG_ADD}) & {M32}) >> 16) & 255)) AS v
    FROM imgs
  ) p(image_id, fmt, v)
)"""


def decode_stats_sql() -> str:
    return f"""WITH {_images_px_cte().lstrip()}
SELECT image_id, fmt,
       COUNT(*)::BIGINT AS n_px,
       SUM(v)::BIGINT AS sum_px,
       SUM(v * v)::BIGINT AS sum_sq,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_px,
       CAST(COUNT(*) * SUM(v * v) - SUM(v) * SUM(v) AS DOUBLE)
         / (COUNT(*) * COUNT(*)) AS var_px
FROM px GROUP BY image_id, fmt
"""


def lossy_error_sql() -> str:
    # err = v - quantized(v) is nonzero only for rawz
    return f"""WITH {_images_px_cte(quantize_rawz=False).lstrip()},
err AS (
  SELECT image_id, fmt,
         CASE WHEN fmt = 'rawz'
              THEN v - ((v >> {RAWZ_SHIFT}) << {RAWZ_SHIFT})
              ELSE 0 END AS e
  FROM px
)
SELECT image_id, fmt,
       SUM(e * e)::BIGINT AS sum_err_sq,
       CAST(SUM(e * e) AS DOUBLE) / COUNT(*) AS mse,
       (CAST(SUM(e * e) AS DOUBLE) / COUNT(*)) <= {MSE_MAX} AS psnr_ok
FROM err GROUP BY image_id, fmt
"""


def resized_stats_sql(out_w: int = 8, out_h: int = 8) -> str:
    """Recompute the nearest-neighbor index grid in SQL: sampled pixel
    index = ((y*h)//out_h)*w + (x*w)//out_w over the ORIGINAL image."""
    return f"""WITH {_images_px_cte().lstrip()},
grid AS (
  SELECT image_id, w, h, fmt, phash,
         UNNEST(LIST_TRANSFORM(RANGE(0, {out_w * out_h}), g ->
           ((g // {out_w}) * h // {out_h}) * w + ((g % {out_w}) * w // {out_w}))) AS pidx
  FROM imgs
),
sampled AS (
  SELECT g.image_id,
         CASE WHEN g.fmt = 'rawz'
              THEN (((((((g.phash % 2147483648) + g.pidx * {LCG_INC}) & {M32})
                      * {LCG_MULT} + {LCG_ADD}) & {M32}) >> 16) & 255)
                   >> {RAWZ_SHIFT} << {RAWZ_SHIFT}
              ELSE ((((((g.phash % 2147483648) + g.pidx * {LCG_INC}) & {M32})
                      * {LCG_MULT} + {LCG_ADD}) & {M32}) >> 16) & 255 END AS v
  FROM grid g
)
SELECT image_id, COUNT(*)::BIGINT AS n_px, SUM(v)::BIGINT AS sum_px,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_px
FROM sampled GROUP BY image_id
"""


def frame_sample_plan_sql(every_n: int = 10) -> str:
    return f"""WITH imgs AS (
  SELECT 'img_' || CAST(doc_id AS VARCHAR) AS image_id,
         CAST(16 + doc_id % 13 AS INT) AS h
  FROM documents
)
SELECT image_id, h::BIGINT AS n_frames,
       ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, (h - 1) // {every_n} + 1),
                                      i -> i * {every_n}), ',') AS frame_idx_csv,
       ((h - 1) // {every_n} + 1)::INT AS n_sampled
FROM imgs
"""
