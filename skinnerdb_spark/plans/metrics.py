"""Executed-plan metric collection — per-query stats parity with the
reference bench (src/benchmark/BenchUtil.java:66-79 emits 16 columns of
UCT/tuple counters; the Spark-meaningful equivalents are shuffle bytes,
spill, and peak operator memory, read from SQLMetrics after execution).

Walks the physical plan (through AQE and query-stage wrappers) and sums the
named SQLMetric values. Call only after an action has run the plan —
metrics are zero before execution.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

#: metric-name fragments -> output keys (summed over all plan nodes)
_METRIC_KEYS = {
    "shuffle bytes written": "shuffle_write_bytes",
    "local bytes read": "shuffle_read_bytes",
    "remote bytes read": "shuffle_read_bytes",
    "spill size": "spill_bytes",
    "peak memory": "peak_mem_bytes",
}


def run_and_count(df: DataFrame) -> int:
    """Execute the DataFrame's OWN physical plan and return its row count.

    ``df.count()`` would plan a *separate* count-aggregate query — columns
    prune away, the real projections never execute, and the plan whose
    metrics we want stays cold. Executing the plan's row RDD and counting it
    runs the genuine plan distributed (per-partition counts summed on the
    executors — nothing materializes on the driver, unlike the previous
    ``executeCollect``, which would OOM the driver on a large result) and
    populates its SQLMetrics for :func:`plan_metrics`.
    """
    try:
        return int(df._jdf.queryExecution().executedPlan().execute().count())
    except Exception:
        return df.count()


def _iter_nodes(node: Any):
    """Yield every SparkPlan node, unwrapping AQE + query-stage shells."""
    yield node
    cls = node.getClass().getSimpleName()
    try:
        if cls == "AdaptiveSparkPlanExec":
            yield from _iter_nodes(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            yield from _iter_nodes(node.plan())
            return
    except Exception:
        pass
    it = node.children().iterator()
    while it.hasNext():
        yield from _iter_nodes(it.next())


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Sum shuffle/spill/memory SQLMetrics over the executed plan.

    Returns {shuffle_count, shuffle_write_bytes, shuffle_read_bytes,
    spill_bytes, peak_mem_bytes, adaptive} — all 0 when the plan has not
    executed yet.
    """
    out = {
        "shuffle_count": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "spill_bytes": 0,
        "peak_mem_bytes": 0,
        "adaptive": False,
    }
    try:
        root = df._jdf.queryExecution().executedPlan()
    except Exception:
        return out
    out["adaptive"] = root.getClass().getSimpleName() == "AdaptiveSparkPlanExec"
    for node in _iter_nodes(root):
        cls = node.getClass().getSimpleName()
        if "ShuffleExchange" in cls:
            out["shuffle_count"] += 1
        try:
            mit = node.metrics().iterator()
        except Exception:
            continue
        while mit.hasNext():
            t = mit.next()
            metric = t._2()
            name = metric.name().isDefined() and metric.name().get() or t._1()
            for frag, key in _METRIC_KEYS.items():
                if frag in str(name):
                    v = int(metric.value())
                    if v > 0:
                        out[key] += v
    return out
