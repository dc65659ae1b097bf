"""Component tests for the corpus-quality / robust-stats tier
(operators/quality.py). Cross-engine value equality is covered by
tests/test_oracle.py; these pin the operator-level invariants the oracle
comparison can't express (discrimination, bound ordering, weight direction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skinnerdb_spark.operators.quality import (
    DSIR_TARGET_SOURCES,
    docs_dsir_weights,
    docs_gopher_quality,
    docs_lexical_diversity,
    ev_winsorize,
)
from skinnerdb_spark.queries.util import read_table


def test_gopher_filter_discriminates(spark, sf_dir):
    """The rule bounds must neither keep nor drop everything — a filter that
    fires on 0% or 100% of the corpus verifies nothing."""
    flags = [r.keep_flag for r in docs_gopher_quality(spark, sf_dir).collect()]
    assert set(flags) == {0, 1}


def test_lexical_diversity_ranges(spark, sf_dir):
    rows = docs_lexical_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.type_token_ratio <= 1.0
        assert 0.0 <= r.simpson_index < 1.0
        assert 0.0 <= r.hapax_ratio <= 1.0
        # Simpson and TTR move inversely at the extremes: a doc of all-unique
        # words has TTR 1 and Simpson 0
        if r.n_types == r.n_words:
            assert r.simpson_index == 0.0


def test_dsir_weights_tilt_toward_target_slice(spark, sf_dir):
    """Docs drawn FROM the target sources must average a higher importance
    weight than the rest — the whole point of the estimator."""
    w = docs_dsir_weights(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = w.join(d, "doc_id").withColumn(
        "is_tgt", F.col("source").isin(*DSIR_TARGET_SOURCES).cast("int")
    )
    means = {
        r.is_tgt: r.m
        for r in j.groupBy("is_tgt").agg(F.avg("dsir_weight").alias("m")).collect()
    }
    assert means[1] > means[0]


def test_winsorize_bounds_and_mean(spark, sf_dir):
    rows = ev_winsorize(spark, sf_dir).collect()
    assert rows
    e = read_table(spark, sf_dir, "events")
    raw = {
        r.event_type: (r.lo, r.hi, r.mu)
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"), F.avg("value").alias("mu"))
        .collect()
    }
    for r in rows:
        lo, hi, _ = raw[r.event_type]
        assert lo <= r.p_lo <= r.p_hi <= hi
        # the winsorized mean sits inside the clamp band
        assert r.p_lo <= r.winsor_mean <= r.p_hi


def test_ccnet_buckets_partition_each_source(spark, sf_dir):
    """Every source splits into exactly head/middle/tail, and the tercile
    sizes differ by at most 1 within a source."""
    from skinnerdb_spark.operators.quality import docs_ccnet_buckets

    rows = docs_ccnet_buckets(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.bucket] = r.n_docs
        assert r.min_score <= r.max_score
    for src, buckets in by_src.items():
        assert set(buckets) == {"head", "middle", "tail"}, src
        sizes = sorted(buckets.values())
        assert sizes[-1] - sizes[0] <= 1, (src, buckets)


def test_rate_limit_caps_every_key(spark, sf_dir):
    from skinnerdb_spark.operators.quality import RATE_LIMIT_K, ev_rate_limit

    df = ev_rate_limit(spark, sf_dir)
    over = (
        df.groupBy("user_id", "hour_ts")
        .count()
        .filter(F.col("count") > RATE_LIMIT_K)
        .count()
    )
    assert over == 0
    assert df.count() > 0


def test_incremental_dedup_discriminates(spark, sf_dir):
    from skinnerdb_spark.operators.dedup import (
        INCR_BATCH_SOURCE,
        dedup_incremental,
    )

    rows = dedup_incremental(spark, sf_dir).collect()
    assert rows
    batch_n = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("source") == INCR_BATCH_SOURCE)
        .count()
    )
    assert len(rows) == batch_n  # every batch doc gets a verdict
    for r in rows:
        assert 0 <= r.seen_shingles <= r.n_shingles
    assert {r.keep_flag for r in rows} == {0, 1}


def test_stream_rate_limit_matches_batch_cap(spark, sf_dir):
    """The stateful streaming throttle keeps exactly min(K, |key|) events
    per (user, hour) — same cardinality contract as the ev_rate_limit batch
    twin (the kept SET legitimately differs: first-K arrivals vs md5-rank
    sample; see stream_rate_limit's selection contract)."""
    import os

    from skinnerdb_spark.operators.quality import RATE_LIMIT_K
    from skinnerdb_spark.streaming.windows import (
        run_stream_once,
        stream_events,
        stream_rate_limit,
    )

    src = os.path.join(sf_dir, "events.parquet")
    rows = run_stream_once(
        stream_rate_limit(stream_events(spark, src)),
        "t_stream_rate_limit",
        output_mode="update",
    )
    got: dict[tuple, int] = {}
    for r in rows:
        key = (r.user_id, r.hour_ts)
        got[key] = max(got.get(key, 0), r.rn)
        assert r.rn <= RATE_LIMIT_K
    e = read_table(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.hour_ts): min(RATE_LIMIT_K, r.n)
        for r in e.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_rate_limit_update_caps_across_batches():
    """Unit contract of the module-level update fn: a key that reached its
    cap in an earlier micro-batch emits nothing in later ones."""
    import pandas as pd

    from skinnerdb_spark.streaming import windows as W

    class FakeState:
        def __init__(self):
            self.exists = False
            self.tup = None

        @property
        def get(self):
            return self.tup

        def update(self, t):
            self.tup = t
            self.exists = True

    W._RATE_LIMIT_K_OVERRIDE = 2
    try:
        state = FakeState()
        key = (7, pd.Timestamp("2024-01-01 05:00:00"))
        b1 = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 05:03", "2024-01-01 05:01", "2024-01-01 05:02"]),
             "event_id": [30, 10, 20]}
        )
        (out1,) = list(W._rate_limit_update(key, [b1], state))
        # first K in (ts, event_id) order: 10 then 20
        assert list(out1.event_id) == [10, 20] and list(out1.rn) == [1, 2]
        assert state.tup == (2,)
        b2 = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 05:04"]), "event_id": [40]}
        )
        (out2,) = list(W._rate_limit_update(key, [b2], state))
        assert out2.empty and state.tup == (2,)
    finally:
        W._RATE_LIMIT_K_OVERRIDE = None


def test_rate_limit_update_sorts_across_chunk_split():
    """applyInPandasWithState may split ONE key's micro-batch across several
    pandas chunks; the 'first K arrivals' contract must follow the global
    (ts, event_id) order, not chunk boundaries (ADVICE r7). Here the
    globally-earliest row lives in the SECOND chunk."""
    import pandas as pd

    from skinnerdb_spark.streaming import windows as W

    class FakeState:
        exists = False
        tup = None

        @property
        def get(self):
            return self.tup

        def update(self, t):
            self.tup = t
            self.exists = True

    W._RATE_LIMIT_K_OVERRIDE = 2
    try:
        state = FakeState()
        key = (7, pd.Timestamp("2024-01-01 05:00:00"))
        c1 = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 05:03", "2024-01-01 05:04"]),
             "event_id": [30, 40]}
        )
        c2 = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 05:01", "2024-01-01 05:02"]),
             "event_id": [10, 20]}
        )
        (out,) = list(W._rate_limit_update(key, [c1, c2], state))
        # a per-chunk sort would keep 30, 40; the global sort keeps 10, 20
        assert list(out.event_id) == [10, 20] and list(out.rn) == [1, 2]
        assert state.tup == (2,)
    finally:
        W._RATE_LIMIT_K_OVERRIDE = None


def test_sem_dropped_in_cluster_unit():
    """Unit contract of the per-cluster SemDeDup Arrow stage: exact int64
    dots, threshold 5*dot >= 2*sqrt(na)*sqrt(nb), drop = farther-from-
    centroid member (ties to the higher vec_id), symmetric in row order."""
    import numpy as np
    import pandas as pd

    from skinnerdb_spark.operators.kmeans import _sem_dropped_in_cluster

    # two identical vectors (cosine 1.0 -> pair fires) + one orthogonal
    qa = [np.array([1000, 0], dtype="int64"),
          np.array([1000, 0], dtype="int64"),
          np.array([0, 1000], dtype="int64")]
    pdf = pd.DataFrame(
        {
            "cell": [0, 0, 0],
            "vec_id": pd.Series([11, 7, 3], dtype="int64"),
            "xn": pd.Series([1000000, 1000000, 1000000], dtype="int64"),
            "d2i": pd.Series([5, 5, 9], dtype="int64"),
            "qa": qa,
        }
    )
    out = _sem_dropped_in_cluster(pdf)
    # only the identical pair fires; equal d2i -> higher vec_id (11) drops
    assert list(out.did) == [11]
    # row order must not change the verdict
    out2 = _sem_dropped_in_cluster(pdf.iloc[::-1].reset_index(drop=True))
    assert list(out2.did) == [11]
    # singleton cluster: typed-empty frame
    empty = _sem_dropped_in_cluster(pdf.iloc[:1])
    assert empty.empty and str(empty.did.dtype) == "int64"


def test_countmin_never_underestimates_and_collides(spark, sf_dir):
    """CMS contract: cms_n >= true_n for EVERY key; and wherever the key
    space outnumbers the sketch width (true at the sf0.01 driver-gate SF:
    150 users vs w=64, where 91/150 keys overestimate), at least one real
    collision must surface — at the tiny local-test SF (15 users) zero
    overestimates is the CORRECT sketch behavior, so the collision
    assertion is conditional."""
    from skinnerdb_spark.operators.quality import CMS_WIDTH, ev_countmin_sketch

    rows = ev_countmin_sketch(spark, sf_dir).collect()
    assert rows
    assert all(r.cms_n >= r.true_n for r in rows)
    assert all(r.overestimate == r.cms_n - r.true_n for r in rows)
    if len(rows) > CMS_WIDTH:
        assert any(r.overestimate > 0 for r in rows)


def test_countmin_counters_buildable_as_streaming_agg(spark, sf_dir):
    """The CMS counter matrix is an ordinary streaming aggregation (the
    mergeable-by-addition property the docstring claims): building the same
    d x w counters over readStream and draining equals the batch counters."""
    import os

    from skinnerdb_spark.operators.quality import CMS_DEPTH, CMS_WIDTH
    from skinnerdb_spark.streaming.windows import run_stream_once, stream_events

    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )

    def counters(df):
        return (
            df.select(
                "user_id",
                F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
            )
            .select("d", bucket.alias("b"))
            .groupBy("d", "b")
            .count()
        )

    src = os.path.join(sf_dir, "events.parquet")
    rows = run_stream_once(
        counters(stream_events(spark, src)),
        "t_stream_cms_counters",
        output_mode="update",
    )
    got: dict[tuple, int] = {}
    for r in rows:  # update mode re-emits per micro-batch; final = max
        key = (r.d, r.b)
        got[key] = max(got.get(key, 0), r["count"])
    from skinnerdb_spark.queries.util import read_table

    expected = {
        (r.d, r.b): r["count"]
        for r in counters(read_table(spark, sf_dir, "events")).collect()
    }
    assert got == expected


def test_kmeans_numpy_rounds_match_reference():
    """Kernel-identity pin for the r11 fused numpy Lloyd rounds
    (operators/kmeans.py): `_np_assign_fn` must reproduce the exact
    integer argmin (score = ||c||^2 - 2*x.c, ties -> LOWEST cell — the
    old min(struct(score, cell)) rule) and `_np_update_partials_fn`'s
    merged partials must equal the brute per-member sums/counts, empty
    batches and empty cells included."""
    import numpy as np
    import pandas as pd

    from skinnerdb_spark.operators.kmeans import (
        DIM,
        KMEANS_K,
        _np_assign_fn,
        _np_update_partials_fn,
    )

    rng = np.random.RandomState(7)
    m = 64
    X = rng.randint(-2_000_000, 2_000_000, size=(m, DIM)).astype(np.int64)
    # force ties: make centroid 5 identical to centroid 2 so their scores
    # tie for every vector — the assignment must pick cell 2
    C = rng.randint(-2_000_000, 2_000_000, size=(KMEANS_K, DIM)).astype(np.int64)
    C[5] = C[2]
    vid = np.arange(m, dtype=np.int64) + 100

    def ref_assign():
        cn = (C.astype(object) ** 2).sum(axis=1)  # object -> unbounded ints
        out = []
        for i in range(m):
            scores = [
                int(cn[c]) - 2 * int(sum(int(a) * int(b) for a, b in zip(X[i], C[c])))
                for c in range(KMEANS_K)
            ]
            best = min(range(KMEANS_K), key=lambda c: (scores[c], c))
            out.append((int(vid[i]), best, scores[best],
                        int(sum(int(a) * int(a) for a in X[i]))))
        return out

    pdf = pd.DataFrame({"vec_id": vid, "qa": [list(r) for r in X]})
    # two chunks + one empty chunk: the iterator contract
    chunks = [pdf.iloc[:40], pdf.iloc[40:40], pdf.iloc[40:]]
    got = pd.concat(list(_np_assign_fn(C)(iter(chunks))), ignore_index=True)
    exp = ref_assign()
    assert [
        (int(r.vec_id), int(r.cell), int(r.score), int(r.xn))
        for r in got.itertuples()
    ] == exp
    # ties resolved to the LOWEST cell: no vector may land on cell 5
    assert not (got.cell == 5).any() and (got.cell == 2).any()

    parts = pd.concat(
        list(_np_update_partials_fn(C)(iter(chunks))), ignore_index=True
    )
    merged = parts.groupby(["cell", "pos"]).agg(s=("s", "sum"), n=("n", "sum"))
    for (cell, pos), row in merged.iterrows():
        members = [i for i, (_, c, _, _) in enumerate(exp) if c == cell]
        assert row["n"] == len(members)
        assert row["s"] == int(X[members, pos].sum())
    # cells with no members emit no partial rows at all
    assigned = {c for _, c, _, _ in exp}
    assert set(merged.index.get_level_values(0)) == assigned


def test_countmin_per_user_fold_matches_exploded_reference(spark, sf_dir):
    """r11: ev_countmin_sketch derives the sketch from the per-user count
    aggregate instead of exploding the event corpus x depth (the bucket
    hash depends only on (d, user_id), so the (d, b) counter is the integer
    sum of true_n over the users hashing into the cell). Pin the identity:
    the entry's output equals the original exploded-corpus computation."""
    from skinnerdb_spark.operators.quality import (
        CMS_DEPTH,
        CMS_WIDTH,
        ev_countmin_sketch,
    )

    e = read_table(spark, sf_dir, "events")
    d_arr = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )
    h = e.select("user_id", d_arr).select("user_id", "d", bucket.alias("b"))
    counters = h.groupBy("d", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    keys = h.select("user_id", "d", "b").distinct()
    est = (
        keys.join(F.broadcast(counters), ["d", "b"])
        .groupBy("user_id")
        .agg(F.min("c").cast("bigint").alias("cms_n"))
    )
    truth = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    ref = truth.join(est, "user_id").select(
        "user_id",
        "true_n",
        "cms_n",
        (F.col("cms_n") - F.col("true_n")).cast("bigint").alias("overestimate"),
    )
    got = sorted(map(tuple, ev_countmin_sketch(spark, sf_dir).collect()))
    want = sorted(map(tuple, ref.collect()))
    assert got == want
