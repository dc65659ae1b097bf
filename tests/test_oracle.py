"""Differential testing vs DuckDB — the reference's own correctness
methodology (Postgres oracle in src/benchmark/BenchAndVerify.java:110-174),
with DuckDB substituted per BASELINE.md.

Mirrors the driver's t2 gate: for every registered query with an oracle, run
the Spark implementation and the oracle SQL on identical parquet inputs and
compare row count, column names, and values (order-insensitive).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from skinnerdb_spark.registry import all_specs

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        # unify date-like columns: Spark DATE -> python date objects,
        # DuckDB DATE -> datetime64
        if df[col].dtype == object and len(df) and df[col].map(
            lambda v: hasattr(v, "toordinal") and not hasattr(v, "hour"), na_action="ignore"
        ).all():
            df[col] = pd.to_datetime(df[col])
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype(float)
            ov = ov.astype(float)
            for i, (a, b) in enumerate(zip(sv, ov)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert a == b or math.isclose(a, b, rel_tol=0, abs_tol=0), (
                    f"{name}.{col}[{i}]: {a!r} != {b!r} (diff {a - b!r})"
                )
        else:
            pd.testing.assert_series_equal(
                sv, ov, check_dtype=False, check_names=False, obj=f"{name}.{col}"
            )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    spec = SPECS[name]
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def _corpus_files() -> list[str]:
    import glob
    import os

    corpus = os.path.join(os.path.dirname(__file__), "..", "queries_sql")
    return sorted(os.path.basename(p) for p in glob.glob(os.path.join(corpus, "*.sql")))


@pytest.mark.slow
@pytest.mark.parametrize("fname", _corpus_files())
def test_corpus_sql_matches_oracle(spark, oracle_con, sf_dir, fname):
    """EVERY committed corpus file (the reference's bench directory analogue)
    is differential-tested against DuckDB, not just timed: same ANSI text,
    both engines, exact compare. Complements the registry gate — the corpus
    is the workload the bench's throughput claim rests on."""
    import os

    from skinnerdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    path = os.path.join(os.path.dirname(__file__), "..", "queries_sql", fname)
    with open(path) as f:
        q = f.read()
    spark_pdf = spark.sql(q).toPandas()
    oracle_pdf = oracle_con.execute(q).df()
    assert_frames_match(spark_pdf, oracle_pdf, fname)
