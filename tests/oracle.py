"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values. Stricter than the driver in one way (it
diffs actual values, so a mismatch is debuggable) and tolerant in one
way (floats compared to 1e-9 relative, since queries already round
both sides).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
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
)


def py_word_shingles(text: str, n: int = 3) -> set:
    """Pure-python oracle for `operators.text.word_shingles` +
    in-row dedup: the DISTINCT word n-grams of a whitespace-split
    text (empty for texts shorter than n words). One copy shared by
    every brute-force similarity oracle in the suite, so a
    tokenization change needs exactly one oracle edit."""
    w = text.split()
    return {" ".join(w[i: i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    # canonical row order: stringify every cell (nulls normalized), sort
    key = df.map(_cell).agg("|".join, axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def assert_matches(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 1e-9) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(duckdb_run(oracle_sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        # Dtype-kind gate (r8): the external driver hashes stringified
        # values, so an int64 column on one side vs float64 on the other
        # ("25" vs "25.0") is a hash mismatch even when values are equal.
        # The classic cause is a DuckDB oracle emitting a bare sum(...):
        # sum(INTEGER/BIGINT) returns HUGEINT, which pandas lands as
        # float64 — wrap the oracle column in CAST(... AS BIGINT). The
        # tolerant float branch below would otherwise mask exactly this.
        g_int, w_int = g.dtype.kind in "iu", w.dtype.kind in "iu"
        g_flt, w_flt = g.dtype.kind == "f", w.dtype.kind == "f"
        assert not (g_int and w_flt) and not (g_flt and w_int), (
            f"{col}: dtype-kind drift spark={g.dtype} oracle={w.dtype} — "
            "the external gate stringifies values, so int-vs-float fails "
            "its hash even when numerically equal (cast the oracle sum "
            "to BIGINT, or the Spark column to double)"
        )
        # Same trap via DECIMAL: a Spark `x * 1.0` parses the literal
        # as DECIMAL, lands in pandas as object-dtype Decimal, and
        # stringifies "1.000000" against the oracle's float64 "1.0".
        import decimal

        for side, series in (("spark", g), ("oracle", w)):
            if series.dtype.kind == "O":
                sample = next((v for v in series if v is not None), None)
                assert not isinstance(sample, decimal.Decimal), (
                    f"{col}: {side} side is DECIMAL (object dtype) — its "
                    "string form ('1.000000') can never hash-match a "
                    "float64 ('1.0'); CAST the division to DOUBLE instead "
                    "of multiplying by a 1.0 literal"
                )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                an, bn = pd.isna(a), pd.isna(b)
                assert an == bn, f"{col}[{i}]: null mismatch {a!r} vs {b!r}"
                if not an:
                    assert math.isclose(float(a), float(b), rel_tol=float_tol, abs_tol=1e-9), (
                        f"{col}[{i}]: {a!r} != {b!r}"
                    )
        else:
            ga, wa = g.map(_cell).tolist(), w.map(_cell).tolist()
            assert ga == wa, (
                f"{col}: value mismatch; first diff at "
                f"{next((i for i, (a, b) in enumerate(zip(ga, wa)) if a != b), None)}: "
                f"{[(a, b) for a, b in zip(ga, wa) if a != b][:5]}"
            )
