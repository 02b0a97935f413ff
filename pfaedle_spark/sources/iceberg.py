"""Iceberg source/sink surface for the image+caption table.

The north rule targets Iceberg tables of (image_id, bytes, w, h, fmt,
caption, phash) at 10^12-image scale. This module is the engine's
Iceberg-first ingest: when an Iceberg catalog is configured on the
session (``spark.sql.catalog.<name>`` — i.e. the
iceberg-spark-runtime jar is on the cluster classpath), reads go
through the catalog table and get Iceberg's partition pruning,
snapshot isolation and file-level statistics; otherwise the SAME
schema contract is served from the parquet testdata, so every operator
upstream is source-agnostic.

Partition-spec design for 10^12 rows (written as DDL so a cluster
deployment can create the table verbatim):

* ``bucket(256, phash)`` — the phash drives the spatial coordinates,
  so bucketing by it co-locates spatially-near rows per file while
  keeping write fan-out bounded (256 files per commit floor); the
  candidate cell join's bbox predicate prunes buckets through
  Iceberg's file stats on the derived x/y columns.
* ``fmt`` identity partition — codec-specific readers (multimodal
  decode) scan only their format's files.

This container has no Iceberg runtime jar (no network installs), so
tests exercise the fallback + the catalog-detection logic; the catalog
path is the documented cluster configuration, not a separate code
fork — both branches return the identical DataFrame contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

IMAGES_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
  image_id STRING,
  bytes    BINARY,
  w        INT,
  h        INT,
  fmt      STRING,
  caption  STRING,
  phash    BIGINT
) USING iceberg
PARTITIONED BY (bucket(256, phash), fmt)
TBLPROPERTIES (
  'write.target-file-size-bytes' = '536870912',
  'write.distribution-mode' = 'hash'
)
"""


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs (``spark.sql.catalog.X``)."""
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in (v or "").lower():
                out.append(k.rsplit(".", 1)[1])
    return out


def read_images(
    spark: SparkSession, sf_dir: str, table: str | None = None
) -> DataFrame:
    """The image+caption table, Iceberg-first.

    ``table`` (e.g. ``lake.db.images``) forces the catalog path; with no
    table and no configured catalog, the identical schema is derived
    from the parquet testdata (datagen.images + with_bytes)."""
    if table is None and iceberg_catalogs(spark):
        table = f"{iceberg_catalogs(spark)[0]}.db.images"
    if table is not None:
        return spark.read.table(table).select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        )
    from .. import datagen

    return datagen.with_bytes(datagen.images(spark, sf_dir)).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )


def write_images(df: DataFrame, table: str, fanout: bool = True) -> None:
    """Append into the Iceberg table (the cluster sink; requires the
    runtime jar). ``fanout`` enables unordered writes so the hash
    distribution mode doesn't force a global sort at 10^12 rows."""
    w = df.writeTo(table)
    if fanout:
        w = w.option("fanout-enabled", "true")
    w.append()
