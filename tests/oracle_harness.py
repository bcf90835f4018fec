"""Replicates the driver's DuckDB-oracle comparison so every queries()
entry is gated locally before the driver sees it: row count, column
names, and order-insensitive exact value match (columns sorted by name,
rows sorted by all columns)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Replicate the DRIVER's order of operations exactly: sort the RAW
    # values first, stringify object columns after. The r5 regression
    # (`token_id_encode`, VERDICT r5 #2) passed locally because this
    # harness used to stringify BEFORE sorting — a list-typed column
    # became a sortable string here but raised `unhashable type: 'list'`
    # in the driver's raw sort. Sorting raw first means any
    # array/map/struct output column now fails the local gate the same
    # way it would fail the driver.
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty means PASS."""
    issues: list[str] = []
    sp = _canon(spark_df.toPandas())
    od = _canon(oracle_pdf)
    if list(sp.columns) != list(od.columns):
        issues.append(f"columns differ: spark={list(sp.columns)} oracle={list(od.columns)}")
        return issues
    if len(sp) != len(od):
        issues.append(f"row count differs: spark={len(sp)} oracle={len(od)}")
        return issues
    for c in sp.columns:
        a, b = sp[c].to_numpy(), od[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            b.dtype, np.floating
        ):
            a = a.astype(np.float64)
            b = b.astype(np.float64)
            # Signbit-exact (VERDICT r7 #2): the driver hashes
            # STRINGIFIED values, and str(-0.0) != str(0.0) even though
            # -0.0 == 0.0. Equal nonzero floats share a signbit, so the
            # extra clause only bites at zero — exactly the r7
            # `pca_project_residual` blind spot.
            bad = ~(
                (np.isnan(a) & np.isnan(b))
                | ((a == b) & (np.signbit(a) == np.signbit(b)))
            )
            # Registry-wide negative-zero sweep: even an AGREEING -0.0
            # pair is a latent hazard (one engine's round() flipping it
            # later breaks the hash silently), so any -0.0 in either
            # engine's output fails the gate outright.
            negz = ((a == 0.0) & np.signbit(a)) | ((b == 0.0) & np.signbit(b))
            if negz.any():
                i = int(np.argmax(negz))
                issues.append(
                    f"column {c}: negative zero present in {int(negz.sum())} "
                    f"cells (first at row {i}: spark={a[i]!r} "
                    f"oracle={b[i]!r}) — normalize with `+ 0.0` after "
                    "round() or integer-quantize"
                )
        else:
            bad = a != b
        if bad.any():
            i = int(np.argmax(bad))
            issues.append(
                f"column {c}: {int(bad.sum())} mismatching values, "
                f"first at row {i}: spark={a[i]!r} oracle={b[i]!r}"
            )
    return issues
