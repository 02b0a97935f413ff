import duckdb
import pandas as pd
import pytest

from pfaedle_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pfaedle_spark_tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def duck(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with testdata views registered (driver contract)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def assert_matches_oracle(spark_df, sql: str, sf_dir: str = SF_DIR, atol: float = 1e-9):
    """Order-insensitive Spark-vs-DuckDB comparison (mirrors the driver)."""
    got = normalize(spark_df.toPandas())
    con = duck(sf_dir)
    want = normalize(con.execute(sql).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False,
                rtol=1e-9, atol=atol, check_index=False,
            )
        else:
            try:
                g2, w2 = g.astype("int64"), w.astype("int64")
                pd.testing.assert_series_equal(g2, w2, check_names=False, check_index=False)
            except (ValueError, TypeError):
                assert g.astype(str).tolist() == w.astype(str).tolist(), f"column {c} differs"
