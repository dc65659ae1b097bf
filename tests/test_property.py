"""Property-based tests (hypothesis): distributed operators vs tiny pure-
Python reference implementations on randomized inputs.

The differential idea mirrors tests/test_fuzz_differential.py (Spark vs
DuckDB on generated SQL); here hypothesis owns the input generation and
shrinking, and the reference is exact Python — so a failure minimizes to
the smallest graph / word list that breaks the operator.

Examples are deliberately few (each drives real Spark jobs); the per-example
input space is where the breadth comes from.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from skinnerdb_spark.operators.dedup import min_label_components, star_components
from skinnerdb_spark.operators.textprims import shingles_expr


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: min node id per component, via path-compressed union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@pytest.mark.parametrize("components", [min_label_components, star_components])
@settings(max_examples=8, deadline=None)
@given(edges=edge_lists)
def test_components_match_union_find(spark, components, edges):
    """Any undirected graph: BOTH distributed CC implementations (min-label
    propagation and large/small-star contraction) must agree with exact
    union-find — including multi-hop chains, cycles, duplicate and reversed
    edges (hypothesis shrinks to the minimal failing graph)."""
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.doc: r.lbl for r in components(pairs).collect()}
    assert got == _union_find_components(edges)


words = st.text(alphabet="abc", min_size=1, max_size=4)


@settings(max_examples=8, deadline=None)
@given(wordlists=st.lists(st.lists(words, min_size=0, max_size=9), min_size=1, max_size=6))
def test_shingles_expr_matches_python(spark, wordlists):
    """shingles_expr == the textbook sliding window for any word list,
    including the < k guard (empty array, never a backwards sequence())."""
    rows = [(i, ws) for i, ws in enumerate(wordlists)]
    df = spark.createDataFrame(rows, "i int, w array<string>").select(
        "i", shingles_expr("w", k=3).alias("sh")
    )
    got = {r.i: r.sh for r in df.collect()}
    want = {
        i: [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        for i, ws in rows
    }
    assert got == want
