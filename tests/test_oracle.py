"""Differential testing vs DuckDB — the reference's own correctness
methodology (Postgres oracle in src/benchmark/BenchAndVerify.java:110-174),
with DuckDB substituted per BASELINE.md.

Mirrors the driver's t2 gate: for every registered query with an oracle, run
the Spark implementation and the oracle SQL on identical parquet inputs and
compare row count, column names, and values (order-insensitive).
"""

from __future__ import annotations

import decimal
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


def _canonical(v) -> str:
    """Canonical per-value text, mirroring the driver's value-hash
    serialization closely enough to catch output-TYPE divergences the old
    float-coercing compare missed (r10 verdict item 2: benford's
    DECIMAL(17,17)-vs-DOUBLE column passed pytest two rounds while the
    driver hash stayed red). str(Decimal) keeps trailing zeros
    ("0.30102999566398120") while repr(float) is shortest-roundtrip
    ("0.3010299956639812"), so a decimal-vs-double split fails HERE now."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays/lists: pd.isna is ambiguous; handled by caller's gate
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _is_scalar_numericish(series: pd.Series) -> bool:
    """True for the column kinds where canonical-text divergence is the
    decimal/double/int bug class: numeric dtypes, or object columns holding
    Decimal/float/int scalars. Arrays, strings, dates stay with the
    value-level compare (dates are already normalized to datetime64)."""
    if pd.api.types.is_float_dtype(series) or pd.api.types.is_integer_dtype(series):
        return True
    if series.dtype == object and len(series):
        sample = series.dropna()
        if len(sample):
            return sample.map(
                lambda v: isinstance(v, (decimal.Decimal, float, int))
                and not isinstance(v, bool)
            ).all()
    return False


def assert_canonical_text_match(
    s: pd.DataFrame, o: pd.DataFrame, name: str
) -> None:
    """Driver-faithful output-type check: for every numeric-ish column,
    the canonical text of each (sorted) value must be IDENTICAL across
    engines — equal floats are not enough, the serialized form must match,
    which is what the driver's value-hash actually compares."""
    for col in s.columns:
        sv, ov = s[col], o[col]
        if not (_is_scalar_numericish(sv) and _is_scalar_numericish(ov)):
            continue
        for i, (a, b) in enumerate(zip(sv, ov)):
            ca, cb = _canonical(a), _canonical(b)
            assert ca == cb, (
                f"{name}.{col}[{i}]: canonical text diverges {ca!r} != {cb!r}"
                f" (types {type(a).__name__} vs {type(b).__name__}) — the"
                " driver value-hash would be RED even if floats are equal"
            )


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
    assert_canonical_text_match(s, o, name)


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


def test_canonical_check_catches_decimal_double_mismatch():
    """The r10 escape, pinned (VERDICT r10 item 2 'done' criterion): a
    Spark DECIMAL(17,17) column vs a DuckDB DOUBLE column with EQUAL float
    values must fail assert_frames_match — the driver's value-hash compares
    canonical text ("0.30102999566398120" vs "0.3010299956639812"), and the
    old float-coercing compare passed this for two rounds while the driver
    row stayed red."""
    oracle = pd.DataFrame({"k": [1, 2], "p": [0.3010299956639812, 0.5]})
    good = pd.DataFrame({"k": [1, 2], "p": [0.3010299956639812, 0.5]})
    assert_frames_match(good, oracle, "good")  # identical floats: fine
    bad = pd.DataFrame({
        "k": [1, 2],
        "p": [
            decimal.Decimal("0.30102999566398120"),
            decimal.Decimal("0.50000000000000000"),
        ],
    })
    with pytest.raises(AssertionError, match="canonical text diverges"):
        assert_frames_match(bad, oracle, "injected_decimal_vs_double")


def test_canonical_check_accepts_equal_decimals():
    """Decimal-vs-decimal with IDENTICAL canonical text must pass — the
    check targets representation divergence, not decimal use per se."""
    a = pd.DataFrame({"v": [decimal.Decimal("1.25"), decimal.Decimal("2.50")]})
    b = pd.DataFrame({"v": [decimal.Decimal("1.25"), decimal.Decimal("2.50")]})
    assert_frames_match(a, b, "equal_decimals")
