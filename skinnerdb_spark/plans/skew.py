"""Skew mitigation utilities — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains necessary when a *single* key dominates
(power-law user_ids, null-heavy FKs) or when the skewed side feeds an
aggregation rather than a join. At 100 TB a hot key can pin one executor for
hours — salting fans it out to ``n_salts`` partitions deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Attach a uniform pseudo-random salt in [0, n_salts) derived from the
    whole row id via monotonically_increasing_id — deterministic within a
    plan, never a Python RNG."""
    return df.withColumn(SALT_COL, (F.monotonically_increasing_id() % n_salts).cast("int"))


def replicate_for_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Explode the build side once per salt value so a salted probe side can
    still match every row: build rows are replicated n_salts times."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe side salted, build side replicated,
    join key extended with the salt so each hot key spreads over n_salts
    shuffle partitions. Semantically identical to probe.join(build, on, how).
    """
    p = salted(probe, n_salts)
    b = replicate_for_salt(build, n_salts)
    cond = on & (p[SALT_COL] == b[SALT_COL])
    return p.join(b, cond, how).drop(SALT_COL)


def aggregate_two_phase(
    df: DataFrame, keys: list[str], aggs: dict[str, Column], n_salts: int = 16
) -> DataFrame:
    """Skew-resistant aggregation: pre-aggregate on (keys + salt), then
    final-aggregate on keys. Only valid for decomposable aggregates the
    caller expresses in two phases (caller passes the *partial* expressions;
    re-aggregation uses the same names). Spark's own partial aggregation
    covers the common case — use this when a single group dwarfs the rest and
    you need the partials spread across partitions first."""
    partial = salted(df, n_salts).groupBy(*keys, SALT_COL).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    from pyspark.sql import functions as F2

    return partial.groupBy(*keys).agg(
        *[F2.sum(n).alias(n) for n in aggs]
    )
