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


#: join types where every output row is driven by the (salted-once) probe
#: side; right/full outer would emit unmatched build rows n_salts times.
_SALT_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe side salted, build side replicated,
    join key extended with the salt so each hot key spreads over n_salts
    shuffle partitions. Semantically identical to probe.join(build, on, how)
    for probe-driven join types only (inner/left/semi/anti) — right/full
    outer are rejected because the replicated build side would emit each
    unmatched build row n_salts times."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports probe-driven join types {sorted(_SALT_SAFE_HOW)}; "
            f"got {how!r} (unmatched build rows would be duplicated per salt)"
        )
    p = salted(probe, n_salts)
    b = replicate_for_salt(build, n_salts)
    cond = on & (p[SALT_COL] == b[SALT_COL])
    return p.join(b, cond, how).drop(SALT_COL)


#: merge functions usable to combine per-salt partials into the final value
_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def aggregate_two_phase(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    merge: dict[str, str] | str = "sum",
) -> DataFrame:
    """Skew-resistant aggregation: pre-aggregate on (keys + salt), then
    final-aggregate on keys. ``aggs`` holds the *partial* expressions;
    ``merge`` names how each partial combines across salts — "sum" (SUM and
    COUNT partials), "min", or "max" — either one name for all or a per-column
    dict. Non-decomposable aggregates (AVG, STDDEV) must be expressed as
    decomposable partials by the caller (e.g. AVG = sum / count computed after
    the merge). Spark's own partial aggregation covers the common case — use
    this when a single group dwarfs the rest and you need the partials spread
    across partitions first."""
    merges = {n: merge for n in aggs} if isinstance(merge, str) else dict(merge)
    unknown = {n: m for n, m in merges.items() if m not in _MERGE_FNS} or {
        n: "<missing>" for n in aggs if n not in merges
    }
    if unknown:
        raise ValueError(
            f"aggregate_two_phase merge must map every agg to one of "
            f"{sorted(_MERGE_FNS)}; got {unknown}"
        )
    partial = salted(df, n_salts).groupBy(*keys, SALT_COL).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE_FNS[merges[n]](n).alias(n) for n in aggs]
    )
