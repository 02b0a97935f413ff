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


# catalog impl classes that are Iceberg catalogs but do not carry the
# substring "iceberg" (wrappers/forks); extend per deployment.
KNOWN_ICEBERG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)

# explicit table identifier: set spark.pfaedle.images.table (or the
# PFAEDLE_IMAGES_TABLE env var) to e.g. lake.warehouse.images; catalog
# auto-detection is only the documented fallback.
TABLE_CONF_KEY = "spark.pfaedle.images.table"
TABLE_ENV_KEY = "PFAEDLE_IMAGES_TABLE"


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs: every ``spark.sql.catalog.X``
    key whose impl is a known Iceberg class or mentions iceberg (the
    allowlist catches wrapper catalogs the substring test would miss)."""
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            impl = (v or "").strip()
            if impl in KNOWN_ICEBERG_IMPLS or "iceberg" in impl.lower():
                out.append(k.rsplit(".", 1)[1])
    return sorted(out)


def configured_table(spark: SparkSession) -> str | None:
    """The explicitly configured image-table identifier, if any."""
    import os

    t = spark.conf.get(TABLE_CONF_KEY, None)
    return t or os.environ.get(TABLE_ENV_KEY) or None


def read_images(
    spark: SparkSession, sf_dir: str, table: str | None = None
) -> DataFrame:
    """The image+caption table, Iceberg-first.

    Resolution order: explicit ``table`` argument > the
    ``spark.pfaedle.images.table`` conf / ``PFAEDLE_IMAGES_TABLE`` env
    identifier > single auto-detected Iceberg catalog (refusing to
    guess between several) > parquet-testdata fallback with the
    identical schema (datagen.images + with_bytes)."""
    if table is None:
        table = configured_table(spark)
    if table is None:
        cats = iceberg_catalogs(spark)
        if len(cats) == 1:
            table = f"{cats[0]}.db.images"
        elif len(cats) > 1:
            raise ValueError(
                f"multiple Iceberg catalogs configured ({cats}); set "
                f"{TABLE_CONF_KEY} (or pass table=) to pick the image "
                "table explicitly"
            )
    if table is not None:
        return spark.read.table(table).select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        )
    from .. import datagen

    return datagen.with_bytes(datagen.images(spark, sf_dir)).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )


CELL_X_COL = "cell_x"


def write_images_partitioned(df: DataFrame, path: str) -> None:
    """Parquet-fallback twin of the Iceberg partition spec: materialize
    the spatial prefix ``cell_x = floor(x / CELL)`` (x is phash-derived,
    exactly as datagen.points computes it) and partition by
    (cell_x, fmt). A bbox predicate on the candidate join's x side then
    becomes a PARTITION filter — whole directories skipped at planning
    time — the same file-level pruning ``bucket(256, phash) + fmt``
    gives through Iceberg's file stats at 10^12 rows."""
    from pyspark.sql import functions as F

    from .. import constants as C

    out = df.withColumn(
        CELL_X_COL,
        F.floor((F.col("phash") % C.COORD_MASK) / C.CELL).cast("int"),
    )
    out.write.mode("overwrite").partitionBy(CELL_X_COL, "fmt").parquet(path)


def read_images_pruned(
    spark: SparkSession, path: str, x_min: float, x_max: float
) -> DataFrame:
    """Scan the partitioned fallback with the bbox prefix predicate
    expressed ON THE PARTITION COLUMN, so Catalyst prunes partitions
    instead of reading every file and filtering rows."""
    from pyspark.sql import functions as F

    from .. import constants as C

    lo = int(x_min // C.CELL)
    hi = int(x_max // C.CELL)
    return spark.read.parquet(path).filter(
        (F.col(CELL_X_COL) >= lo) & (F.col(CELL_X_COL) <= hi)
    )


def write_images(df: DataFrame, table: str, fanout: bool = True) -> None:
    """Append into the Iceberg table (the cluster sink; requires the
    runtime jar). ``fanout`` enables unordered writes so the hash
    distribution mode doesn't force a global sort at 10^12 rows."""
    w = df.writeTo(table)
    if fanout:
        w = w.option("fanout-enabled", "true")
    w.append()
