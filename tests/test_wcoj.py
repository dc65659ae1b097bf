"""Worst-case-optimal join (operators/wcoj.py) component tests.

The oracle gate (test_oracle.py) already differential-tests the two
registered entries end-to-end vs DuckDB; these tests pin the machinery's
own invariants: hypercube no-duplicate production, equivalence with binary
join plans on both cyclic and acyclic shapes, and the static/adaptive
variable-order selectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skinnerdb_spark.operators.wcoj import (
    _adaptive_order,
    choose_variable_order,
    hypercube_generic_join,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def _atoms(edges, pairs):
    return [
        (edges.select(F.col("u").alias(x), F.col("v").alias(y)), (x, y))
        for x, y in pairs
    ]


#: id-ordered toy graph: triangles (1,2,3), (1,2,4), (2,3,4) share edges,
#: node 9 dangles, (5,6)/(6,7) form an open wedge
_TOY = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7), (1, 9)]


def test_triangle_wcoj_matches_binary_join_plan(spark):
    edges = _edges_df(spark, _TOY)
    got = hypercube_generic_join(
        spark, _atoms(edges, [("a", "b"), ("b", "c"), ("a", "c")]),
        var_order=["a", "b", "c"], total_cells=8)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    want = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
                F.col("e2.v").alias("c"))
    )
    rows = got.collect()
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in want.collect())
    # hypercube addressing produces each output tuple in exactly one cell
    assert len(rows) == len(set(tuple(r) for r in rows))


def test_clique4_wcoj_on_toy_graph(spark):
    edges = _edges_df(spark, _TOY)
    got = hypercube_generic_join(
        spark,
        _atoms(edges, [("a", "b"), ("a", "c"), ("a", "d"),
                       ("b", "c"), ("b", "d"), ("c", "d")]),
        var_order=["a", "b", "c", "d"], total_cells=16)
    assert sorted(tuple(r) for r in got.collect()) == [(1, 2, 3, 4)]


def test_acyclic_path_query_equals_binary_join(spark):
    edges = _edges_df(spark, _TOY)
    got = hypercube_generic_join(
        spark, _atoms(edges, [("a", "b"), ("b", "c")]),
        var_order=["b", "a", "c"], total_cells=9)
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    want = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.v").alias("b"), F.col("e1.u").alias("a"),
        F.col("e2.v").alias("c"))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect())


def test_empty_atom_yields_empty_result(spark):
    edges = _edges_df(spark, _TOY)
    none = edges.filter(F.lit(False))
    got = hypercube_generic_join(
        spark,
        _atoms(edges, [("a", "b"), ("b", "c")])[:1]
        + _atoms(none, [("b", "c")]),
        total_cells=4)
    assert got.count() == 0


def test_static_order_most_constrained_first():
    class _Fake:
        pass

    atoms = [(_Fake(), ("a", "b")), (_Fake(), ("b", "c")), (_Fake(), ("b", "d"))]
    assert choose_variable_order(atoms) == ["b", "a", "c", "d"]


def test_adaptive_order_binds_most_selective_first(spark):
    # variable c has 1 distinct value, a/b have many -> adaptive puts c first
    r = spark.createDataFrame([(i, i + 1) for i in range(50)], "a bigint, b bigint")
    s = spark.createDataFrame([(i + 1, 7) for i in range(50)], "b bigint, c bigint")
    order = _adaptive_order([(r, ("a", "b")), (s, ("b", "c"))])
    assert order[0] == "c"
    got = hypercube_generic_join(
        spark, [(r, ("a", "b")), (s, ("b", "c"))], total_cells=8, adaptive=True)
    assert got.count() == 50


def test_reserved_variable_names_rejected(spark):
    edges = _edges_df(spark, _TOY)
    atoms = [(edges.select(F.col("u").alias("__b"), F.col("v").alias("x")),
              ("__b", "x"))]
    try:
        hypercube_generic_join(spark, atoms, total_cells=2)
    except ValueError as exc:
        assert "reserved" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for reserved variable name")


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_generic_join_cell_matches_bruteforce(seed):
    """Property test of the in-cell GenericJoin (pure pandas, no Spark):
    random edge sets, triangle query, compared against brute-force
    enumeration over all variable assignments."""
    import itertools
    import random

    import pandas as pd

    from skinnerdb_spark.operators.wcoj import _generic_join_cell

    rng = random.Random(seed)
    nodes = list(range(10))
    edges = sorted({(u, v) for u in nodes for v in nodes
                    if u < v and rng.random() < 0.3})
    atoms_vars = (("a", "b"), ("b", "c"), ("a", "c"))
    # packed wire format: positional __v0/__v1 slots, mapped to variables
    # per atom via atoms_vars (see _generic_join_cell docstring)
    rows = []
    for rel in range(len(atoms_vars)):
        for u, v in edges:
            rows.append({"__rel": rel, "__v0": u, "__v1": v})
    pdf = pd.DataFrame(rows)
    got = _generic_join_cell(pdf, atoms_vars, ("a", "b", "c"))
    got_set = set(map(tuple, got.to_numpy().tolist()))

    eset = set(edges)
    want = {
        (a, b, c)
        for a, b, c in itertools.permutations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }
    assert got_set == want


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_numpy_and_pandas_cell_kernels_identical(seed):
    """The packed-int64 numpy fast path (r11) and the general pandas kernel
    must produce the same rows on the same cell input — 4-clique pattern,
    random graphs, plus the two fallback triggers (a value at 2^31 routes
    to pandas; a ternary atom routes to pandas) exercised explicitly."""
    import random

    import pandas as pd

    from skinnerdb_spark.operators.wcoj import (
        _generic_join_cell,
        _generic_join_cell_np,
        _generic_join_cell_pd,
    )

    rng = random.Random(seed)
    nodes = list(range(14))
    edges = sorted({(u, v) for u in nodes for v in nodes
                    if u < v and rng.random() < 0.5})
    atoms_vars = (("a", "b"), ("a", "c"), ("a", "d"),
                  ("b", "c"), ("b", "d"), ("c", "d"))
    rows = [{"__rel": rel, "__v0": u, "__v1": v}
            for rel in range(len(atoms_vars)) for u, v in edges]
    pdf = pd.DataFrame(rows)
    vo = ("a", "b", "c", "d")
    got_np = (_generic_join_cell_np(pdf, atoms_vars, vo)
              .sort_values(list(vo)).reset_index(drop=True).astype("int64"))
    got_pd = (_generic_join_cell_pd(pdf, atoms_vars, vo)
              .sort_values(list(vo)).reset_index(drop=True).astype("int64"))
    assert len(got_np) > 0  # non-degenerate input
    pd.testing.assert_frame_equal(got_np, got_pd)

    # fallback trigger 1: a value outside [0, 2^31) must route the dispatch
    # to the pandas kernel and still produce the same (shifted) rows
    big = pdf.copy()
    big[["__v0", "__v1"]] = big[["__v0", "__v1"]] + (1 << 31)
    got_big = (_generic_join_cell(big, atoms_vars, vo)
               .sort_values(list(vo)).reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got_big - (1 << 31), got_pd)

    # fallback trigger 2: a ternary atom is out of the numpy kernel's
    # contract; the dispatcher must not send it there
    tri_rows = [{"__rel": 0, "__v0": u, "__v1": v, "__v2": w}
                for u, v, w in [(1, 2, 3), (1, 2, 4), (2, 3, 4)]]
    tri = pd.DataFrame(tri_rows)
    out = _generic_join_cell(tri, (("x", "y", "z"),), ("x", "y", "z"))
    assert set(map(tuple, out.to_numpy().tolist())) == {
        (1, 2, 3), (1, 2, 4), (2, 3, 4)}
