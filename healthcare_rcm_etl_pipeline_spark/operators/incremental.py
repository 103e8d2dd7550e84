"""Incremental aggregate maintenance — merge a delta batch into a prior
aggregate state instead of recomputing the full history.

The 100 TB pattern this encodes: a daily pipeline over an append-only fact
table must NOT re-scan years of history to refresh a rollup. Keep the
aggregate STATE (per-group partials), aggregate ONLY the new batch, and
merge the two with group-wise combine functions. Correct for any
commutative-monoid aggregate:

- sum / count  -> merge by sum
- min / max    -> merge by min / max
- avg          -> carry (sum, count) partials, divide at read time
- count distinct does NOT cascade — use an HLL sketch state
  (approx_count_distinct over merged sketches) or keep exact distinct at
  the finest level only; see sketch_distinct_tolerance.

Batch mirror of what Structured Streaming's stateful aggregation does with
its state store — expressed here as plain DataFrames so the same merge runs
in both batch backfill and streaming foreachBatch upsert
(streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function per state-column kind
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def agg_state(df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]) -> DataFrame:
    """Build aggregate state from scratch for one batch.

    ``spec`` maps state-column name -> (kind, source expression), where kind
    is one of sum/count/min/max. Example::

        {"total": ("sum", "o_totalprice"), "n": ("count", "*"),
         "first_dt": ("min", "o_orderdate")}
    """
    aggs = []
    for name, (kind, src) in spec.items():
        if kind not in _MERGES and kind != "count":
            raise ValueError(f"unsupported aggregate kind {kind!r} for {name!r}")
        if kind == "count":
            aggs.append(F.count(F.lit(1) if src == "*" else F.expr(src)).alias(name))
        else:
            aggs.append(_MERGES[kind](F.expr(src)).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    prior: DataFrame, delta_state: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge two aggregate states (prior + delta) group-wise.

    union + one groupBy over the (small) state tables — never touches the
    raw history. New groups appear automatically; groups absent from the
    delta pass through unchanged. Both inputs must have the schema produced
    by :func:`agg_state` with the same ``spec``.
    """
    merged = [
        _MERGES["sum" if kind == "count" else kind](name).alias(name)
        for name, (kind, _) in spec.items()
    ]
    return prior.unionByName(delta_state).groupBy(*keys).agg(*merged)
