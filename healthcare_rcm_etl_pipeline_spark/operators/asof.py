"""As-of (most-recent-match) join — a time-series operator Spark has no
native form for, composed from a union + window (option (a) of the custom-
operator ladder: built-in DataFrame ops before Pandas UDFs).

asof_join(left, right): for each left row, attach the latest right row of
the same key with right.ts <= left.ts. Implementation: tag and union both
sides, sort within key by (ts, side) — right rows sort before left rows at
equal ts, giving >= semantics — then a running ``last(right_val, ignorenulls)``
window carries the most recent right row forward onto each left row.

Scale shape: one shuffle on the key (window partition), linear scan within
partitions — no range-join explosion, no per-key collect. Skewed keys get
AQE treatment like any other window; for pathological single-key skew,
pre-split by coarse time bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row per key with right_ts <= left_ts.

    Returns all left columns plus ``<col><suffix>`` for each requested right
    column (and ``<right_ts><suffix>``), null when no prior right row exists.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts -> inclusive match
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_ts), *[F.col(c) for c in right_cols]).alias("s"))
            .schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(F.col(right_ts), *[F.col(c) for c in right_cols]).alias("__r"),
    )

    # __r as the final order key makes the carried row total-order defined
    # when multiple right rows share (key, ts): struct comparison orders by
    # (right_ts, *right_cols), so the max such row wins under ANY partition
    # layout — without it, last() would be partition-order-dependent. Left
    # rows (__r null) never tie with right rows because __side differs.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__asof.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__asof.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out_cols)
