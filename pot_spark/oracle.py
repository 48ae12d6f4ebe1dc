"""Spark-vs-DuckDB parity checker — mirrors the driver's t2 gate
(row-count + schema-name + order-insensitive value comparison) so every
query can be validated locally before the driver sees it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from pot_spark.tables import TABLE_NAMES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = -1
    oracle_rows: int = -1
    errors: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for e in self.errors:
            msg += f"\n    - {e}"
        return msg


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists/ndarrays -> tuples so they sort/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
        if df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def check_parity(
    spark: SparkSession, name: str, fn, oracle: str | None, sf_dir: str
) -> ParityResult:
    res = ParityResult(name=name, ok=True)
    try:
        spark_df = fn(spark, sf_dir)
        # The external driver's canonicalizer pandas-sorts every output
        # column and dies (TypeError: unhashable type) on array/map/
        # struct values — even for rows-only queries. The local mirror
        # therefore rejects complex-typed output columns registry-wide;
        # serialize them to joined strings (the q_array_agg pattern).
        complex_cols = [
            (c, t)
            for c, t in spark_df.dtypes
            if any(k in t for k in ("array", "map", "struct"))
        ]
        if complex_cols:
            res.ok = False
            res.errors.append(
                "complex-typed output column(s) would crash the external "
                f"canonicalizer: {complex_cols} — stringify them"
            )
            return res
        sdf = spark_df.toPandas()
    except Exception as e:  # noqa: BLE001
        res.ok = False
        res.errors.append(f"spark error: {type(e).__name__}: {str(e)[:500]}")
        return res
    res.spark_rows = len(sdf)
    if oracle is None:
        if res.spark_rows < 0:
            res.ok = False
        return res
    try:
        con = duck_connection(sf_dir)
        odf = con.sql(oracle).df()
    except Exception as e:  # noqa: BLE001
        res.ok = False
        res.errors.append(f"oracle error: {type(e).__name__}: {str(e)[:500]}")
        return res
    res.oracle_rows = len(odf)
    if len(sdf) != len(odf):
        res.ok = False
        res.errors.append(f"row count mismatch: {len(sdf)} vs {len(odf)}")
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.errors.append(f"column mismatch: {s_cols} vs {o_cols}")
        return res
    if not res.ok:
        return res
    try:
        sc, oc = _canon(sdf), _canon(odf)
    except Exception as e:  # noqa: BLE001
        res.ok = False
        res.errors.append(f"canon error: {type(e).__name__}: {str(e)[:300]}")
        return res
    for c in sc.columns:
        sv, ov = sc[c], oc[c]
        if str(sv.dtype) != str(ov.dtype):
            # a dtype skew is a FAILURE, not a note: an external checker
            # enforcing schema equality marks the query red even when
            # values agree, so the local mirror must too (the whole
            # inventory holds dtype parity — see the Q7/Q8/ym fixes)
            res.ok = False
            res.errors.append(f"dtype differs on {c}: {sv.dtype} vs {ov.dtype}")
        try:
            equal = sv.equals(ov)
        except Exception:
            equal = False
        if not equal:
            mism = (sv != ov) & ~(sv.isna() & ov.isna())
            try:
                n_bad = int(mism.sum())
            except Exception:
                n_bad = -1
            if n_bad:
                res.ok = False
                idx = mism[mism].index[:3].tolist() if n_bad > 0 else []
                examples = [
                    f"row{q}: spark={sv.iloc[q]!r} oracle={ov.iloc[q]!r}" for q in idx
                ]
                res.errors.append(
                    f"value mismatch on {c}: {n_bad} rows, e.g. {'; '.join(examples)}"
                )
    return res


def run_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None):
    import os

    from pot_spark import registry

    # Hash-parity compares against EXACT DuckDB SQL, so the adaptive
    # dedup chooser must never take its approximate banded tier here —
    # force the exact fallback for the duration of the sweep (the env
    # is read per-query-build, so this covers every resolve call).
    # Restored afterward: tests share a process with parity runs.
    prior = os.environ.get("POT_SPARK_DEDUP_FORCE_EXACT")
    os.environ["POT_SPARK_DEDUP_FORCE_EXACT"] = "1"
    try:
        registry.load_all_query_modules()
        results = []
        for name, fn in registry.QUERIES.items():
            if only and name not in only:
                continue
            results.append(
                check_parity(
                    spark, name, fn, registry.ORACLES.get(name), sf_dir
                )
            )
        return results
    finally:
        if prior is None:
            os.environ.pop("POT_SPARK_DEDUP_FORCE_EXACT", None)
        else:
            os.environ["POT_SPARK_DEDUP_FORCE_EXACT"] = prior
