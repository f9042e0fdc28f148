"""Mini clone of the driver's DuckDB-oracle comparison (sorted columns,
order-insensitive rows, exact values) for local conformance tests."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_query_matches(query_fn, sql: str, sf_dir: str) -> None:
    ray_df = normalize(to_pandas(query_fn(sf_dir)))
    con = duck_con(sf_dir)
    oracle_df = normalize(con.execute(sql).fetchdf())
    con.close()
    assert list(ray_df.columns) == list(oracle_df.columns), (
        f"column mismatch: {list(ray_df.columns)} != {list(oracle_df.columns)}"
    )
    assert len(ray_df) == len(oracle_df), (
        f"row count mismatch: {len(ray_df)} != {len(oracle_df)}"
    )
    # the driver's value hash is dtype-sensitive (int64 vs HUGEINT->float64,
    # timestamp[s] vs [us] all hash-mismatch despite equal values) — mirror
    # that here so oracle-SQL dtype drift fails locally, not at judging time
    assert list(map(str, ray_df.dtypes)) == list(map(str, oracle_df.dtypes)), (
        f"dtype mismatch:\n engine {dict(ray_df.dtypes.astype(str))}\n"
        f" oracle {dict(oracle_df.dtypes.astype(str))}"
    )
    pd.testing.assert_frame_equal(
        ray_df, oracle_df, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )
