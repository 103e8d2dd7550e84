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


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete events) to a snapshot —
    the MERGE INTO analog for the reference's warehouse-load step
    (python/load.py truncates and rewrites whole tables; this is the
    incremental path that replaces a full rewrite at 100 TB).

    ``changelog`` columns: the snapshot's columns + ``seq_col`` (a total
    order per key — e.g. a log offset; ties would make the net effect
    undefined, so the caller must guarantee uniqueness per key) + ``op_col``
    with values 'I'/'U'/'D'. Net effect per key = the row with the highest
    ``seq_col``; 'D' removes the key, 'I'/'U' upsert the payload.

    Scale: the changelog reduction is ``groupBy(key).agg(max_by(payload,
    seq))`` — a partial-aggregable reduction (map-side combine shrinks each
    task's output to its distinct keys BEFORE the exchange), strictly better
    than the window-function formulation which must shuffle every changelog
    row. The snapshot side then does one left_anti equi-join on the touched
    keys (AQE broadcasts it when the day's churn is small — the common case:
    daily churn << snapshot size).
    """
    payload = [c for c in snapshot.columns if c != key]
    missing = [c for c in [key, *payload, seq_col, op_col] if c not in changelog.columns]
    if missing:
        raise ValueError(f"changelog missing columns {missing}")
    latest = (
        changelog.groupBy(key)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload], F.col(op_col)), F.col(seq_col)
            ).alias("__r")
        )
        .select(key, "__r.*")
    )
    upserts = latest.filter(F.col(op_col) != "D").drop(op_col)
    untouched = snapshot.join(latest.select(key), key, "left_anti")
    return untouched.unionByName(upserts)
