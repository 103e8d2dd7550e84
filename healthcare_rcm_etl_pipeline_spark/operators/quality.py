"""Data-quality checks (SURVEY.md §2m, V1-V3) as composable operators.

Reference: /root/reference/python/dimensional_modeling.py:80-100 (orphan FK +
positive-amount checks), /root/reference/python/load.py:115-119 (row-count
reconciliation). All checks are distributed (left_anti joins / filtered
counts) — no isin-lists collected to the driver, so they run at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def orphans(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str | None = None) -> DataFrame:
    """Fact rows whose FK has no match in the dimension (V1) — left_anti.

    NULL FKs count as orphans, matching the reference's
    ``~fact.patient_sk.isin(valid_keys)`` semantics
    (dimensional_modeling.py:87-88: NaN.isin -> False -> flagged)."""
    dim_key = dim_key or fact_key
    keys = dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates()
    return fact.join(keys, fact_key, "left_anti")


def rule_violations(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating a business rule (V2), e.g. ``col('Amount') <= 0``."""
    return df.filter(predicate)


def reconcile_counts(written: DataFrame, readback: DataFrame) -> bool:
    """Row-count reconciliation after a load (V3/S8)."""
    return written.count() == readback.count()


_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: per column, row/null/distinct counts and
    min/max — the standard pre-ingest data-quality sweep.

    ONE aggregate job over the table produces every column's stats
    simultaneously (Catalyst plans the multi-distinct via a single Expand;
    at very wide tables or 100 TB swap ``count_distinct`` for
    ``approx_count_distinct`` — the rest partial-aggregates map-side).
    The wide one-row result is then unpivoted to one row per column with
    array+explode (driver never sees data, just the plan).

    min/max are typed: numeric columns report ``min_num``/``max_num`` as
    DOUBLE; string/date/timestamp columns report ``min_str``/``max_str`` as
    strings (cross-engine float formatting makes stringified numerics
    unportable — typed slots keep the profile oracle-checkable).
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        base = dtypes[c].split("(")[0]
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.count_distinct(c).alias(f"{c}__nd"))
        if base in _NUMERIC_TYPES or base == "decimal":
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min_str"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max_str"))
    wide = df.agg(*aggs)
    per_col = []
    for c in cols:
        base = dtypes[c].split("(")[0]
        is_num = base in _NUMERIC_TYPES or base == "decimal"
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.col(f"{c}__min_num") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"{c}__max_num") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"{c}__min_str") if not is_num else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"{c}__max_str") if not is_num else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


@dataclass
class QualityReport:
    name: str
    violation_count: int
    passed: bool


def check(name: str, violations: DataFrame, allow: int = 0) -> QualityReport:
    n = violations.count()
    return QualityReport(name=name, violation_count=n, passed=n <= allow)


def expectations_report(df: DataFrame, expectations: list[tuple[str, str, dict]]) -> DataFrame:
    """Declarative expectation suite (Deequ-style) evaluated in ONE scan.

    ``expectations`` is a list of (name, kind, params):

    - ``not_null``        params: col
    - ``accepted_values`` params: col, values
    - ``in_range``        params: col, lo, hi  (violation: <= lo or > hi)
    - ``unique``          params: col          (violation count: rows - distinct)

    Row-level kinds fold into a single conditional-sum aggregate over one
    pass; each ``unique`` adds a count-distinct to the same aggregate (no
    second scan). Returns (expectation, kind, n_violations, passed) — the
    gate report a warehouse load writes next to the data. Distributed
    throughout; nothing collects to the driver.
    """
    aggs, rows = [], []
    for name, kind, p in expectations:
        safe = f"__v_{len(aggs)}"
        if kind == "not_null":
            cond = F.col(p["col"]).isNull()
        elif kind == "accepted_values":
            cond = ~F.col(p["col"]).isin(p["values"]) | F.col(p["col"]).isNull()
        elif kind == "in_range":
            cond = (
                (F.col(p["col"]) <= p["lo"])
                | (F.col(p["col"]) > p["hi"])
                | F.col(p["col"]).isNull()
            )
        elif kind == "unique":
            # COUNT(*) (not COUNT(col)): NULL-key rows count as violations —
            # a NULL in a uniqueness-checked key is never a valid key, and
            # this matches the oracle's COUNT(*) - COUNT(DISTINCT col).
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(F.col(p["col"]))).alias(safe)
            )
            rows.append((name, kind, safe))
            continue
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(safe))
        rows.append((name, kind, safe))
    agg = df.agg(*aggs)
    out = None
    for name, kind, safe in rows:
        r = agg.select(
            F.lit(name).alias("expectation"),
            F.lit(kind).alias("kind"),
            F.col(safe).cast("bigint").alias("n_violations"),
            (F.col(safe) == 0).alias("passed"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution-drift report between a REFERENCE slice and a CURRENT
    slice of the same numeric column: PSI (population stability index,
    the standard model/data-monitoring drift score) and the binned KS
    statistic (max CDF gap), per group — the check a training-data
    pipeline runs between corpus snapshots before re-training, and a
    warehouse runs between loads before publishing.

    Binning: ``n_bins`` fixed-width bins over the REFERENCE min/max (the
    reference defines the ruler — standard PSI practice); out-of-range
    current values clamp into the edge bins, so novel mass is visible,
    never dropped. Proportions are Laplace-smoothed
    ((count + 0.5) / (total + n_bins/2)) so empty bins contribute finite
    PSI terms. NULL values are excluded on both sides (they are a
    missing-rate question, not a distribution question — see
    ``profile_table``).

    Shape at 100 TB: one 1-row aggregate for the edges (broadcast), one
    hash aggregation per side on (group, bin) — map-side combinable, the
    shuffle carries |groups|·n_bins rows — then spine-join + window over
    n_bins rows per group. The corpus is scanned exactly twice (once per
    side) and nothing larger than the bin grid moves.

    Determinism / oracle-exactness: bin assignment, smoothing and the
    PSI/KS arithmetic are fixed-shape IEEE double expressions (identical
    in the DuckDB oracle); psi/ks round at 6 dp. Returns
    (*group_cols, psi, ks, n_ref, n_cur).

    One-sided groups: a group present in only one slice (novel or
    vanished population) reports psi = NULL and ks = NULL — an explicit
    "not comparable" sentinel, NOT "no drift". n_ref/n_cur show which
    side is empty; consumers should treat such groups as
    maximal-severity drift, not skip them.
    """
    group_cols = list(group_cols or [])
    edges = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("__mn"),
        F.max(F.col(value_col).cast("double")).alias("__mx"),
    )

    def _binned(df: DataFrame, cnt_name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        width_num = (v - F.col("__mn")) * F.lit(float(n_bins))
        raw = F.floor(width_num / (F.col("__mx") - F.col("__mn")))
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
        # degenerate ruler (constant reference): everything is bin 0
        bin_ = (
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
            .otherwise(clamped)
            .cast("int")
        )
        return (
            df.filter(v.isNotNull())
            .join(F.broadcast(edges))
            .select(*group_cols, bin_.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )

    rc = _binned(ref, "__rc")
    cc = _binned(cur, "__cc")
    groups = (
        rc.select(*group_cols).union(cc.select(*group_cols)).distinct()
        if group_cols
        else rc.sparkSession.range(1).select()
    )
    spine = groups.select(
        *group_cols, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    j = (
        spine.join(rc, [*group_cols, "bin"], "left")
        .join(cc, [*group_cols, "bin"], "left")
        .fillna(0, subset=["__rc", "__cc"])
    )
    w_tot = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy()
    w_cum = w_tot.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    half = float(n_bins) / 2.0
    j = (
        j.withColumn("__rt", F.sum("__rc").over(w_tot))
        .withColumn("__ct", F.sum("__cc").over(w_tot))
        .withColumn("__pr", (F.col("__rc") + F.lit(0.5)) / (F.col("__rt") + F.lit(half)))
        .withColumn("__pc", (F.col("__cc") + F.lit(0.5)) / (F.col("__ct") + F.lit(half)))
        .withColumn("__crc", F.sum("__rc").over(w_cum))
        .withColumn("__ccc", F.sum("__cc").over(w_cum))
    )
    # One-sided groups (present in only ref or only cur — novel/vanished
    # populations, the MOST-drifted case) must not read as "no drift": the
    # smoothing-only pseudo-PSI against a 0.5-per-bin baseline would
    # underreport them, and the KS ratio's division by a zero total is
    # engine-dependent noise. Both are guarded to NULL — the explicit
    # "not comparable" sentinel — with n_ref/n_cur showing WHICH side is
    # empty, so monitoring consumers can route novel/vanished groups to
    # their own (maximal-severity) alert path instead of reading a number.
    both_sided = (F.max("__rt") > 0) & (F.max("__ct") > 0)
    return (
        j.groupBy(*group_cols)
        .agg(
            F.when(
                both_sided,
                F.round(
                    F.sum(
                        (F.col("__pc") - F.col("__pr"))
                        * F.log(F.col("__pc") / F.col("__pr"))
                    ),
                    6,
                ),
            ).alias("psi"),
            F.when(
                both_sided,
                F.round(
                    F.max(
                        F.abs(
                            # try_divide: under ANSI mode a one-sided
                            # group's zero total would otherwise raise
                            # per-row before the result-level guard runs
                            F.try_divide(F.col("__crc").cast("double"), F.col("__rt"))
                            - F.try_divide(F.col("__ccc").cast("double"), F.col("__ct"))
                        )
                    ),
                    6,
                ),
            ).alias("ks"),
            F.max("__rt").cast("bigint").alias("n_ref"),
            F.max("__ct").cast("bigint").alias("n_cur"),
        )
    )


def windowed_distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Production drift MONITORING: per tumbling event-time window of the
    CURRENT stream, the PSI and binned-KS of ``value_col`` against a
    PINNED static reference snapshot — ``distribution_drift`` is the
    two-snapshot gate, this is the continuously-emitted score a serving
    stack alerts on (reference window vs sliding/tumbling current window).

    The SAME body runs in batch (tests, oracle) and under Structured
    Streaming: everything is ONE aggregation — per (group, window), the
    ``n_bins`` bin counts are unrolled into conditional-sum columns, and
    PSI/KS are fixed-shape scalar expressions over those columns — so the
    plan is streaming-legal (multi-stage aggregations are not; the
    row-form bin grid of ``distribution_drift`` would need two). The
    reference side must be STATIC (asserted): its ruler (min/max edges)
    and per-group bin grid are tiny one-row/|groups|-row relations,
    broadcast into the stream (stream-static joins).

    Same contract as ``distribution_drift``: reference-defined fixed-width
    bins, out-of-range current mass clamps into the edge bins, Laplace
    smoothing ((count + 0.5) / (total + n_bins/2)), NULL values excluded,
    psi/ks rounded at 6 dp. A (group, window) whose group has NO
    reference rows (novel population) is reported with psi = ks = NULL
    and n_ref = NULL — the "not comparable" sentinel, never a
    smoothing-only pseudo-score; windows with no current events emit no
    row (the output is current-driven). PSI sums its 10 terms in fixed
    bin order; cumulative KS counts are exact BIGINTs, so the arithmetic
    is engine-identical up to the final 6-dp round (the
    ``drift_psi_events`` oracle device).

    Shape at 100 TB: the stream is scanned once; the shuffle carries one
    row per (group, window) of width n_bins+2 (map-side combinable
    conditional sums), the reference grid rides as a broadcast. Streaming
    state is the open windows only — watermark-evicted, never
    corpus-sized.

    Returns (*group_cols, window_start, psi, ks, n_ref, n_cur).
    """
    if ref.isStreaming:
        raise ValueError("the reference snapshot must be a static DataFrame")
    group_cols = list(group_cols or [])
    half = float(n_bins) / 2.0
    edges = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("__mn"),
        F.max(F.col(value_col).cast("double")).alias("__mx"),
    )

    def _bin_col() -> F.Column:
        v = F.col(value_col).cast("double")
        raw = F.floor((v - F.col("__mn")) * F.lit(float(n_bins)) / (F.col("__mx") - F.col("__mn")))
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
        return (
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
            .otherwise(clamped)
            .cast("int")
            .alias("__bin")
        )

    # join key: the group columns, or a constant for the ungrouped case
    # (a bare stream-static cross join is not universally supported)
    keys = group_cols or ["__k"]
    konst = [] if group_cols else [F.lit(1).alias("__k")]

    rv = F.col(value_col).cast("double")
    ref_grid = (
        ref.filter(rv.isNotNull())
        .join(F.broadcast(edges))
        .select(*group_cols, *konst, _bin_col())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__rt"),
            *[
                F.sum(F.when(F.col("__bin") == b, 1).otherwise(0)).alias(f"__rc{b}")
                for b in range(n_bins)
            ],
        )
    )
    cur_agg = (
        cur.filter(rv.isNotNull())
        .join(F.broadcast(edges))
        .select(*group_cols, *konst, F.col(ts_col), _bin_col())
        .groupBy(*keys, F.window(ts_col, duration).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("__ct"),
            *[
                F.sum(F.when(F.col("__bin") == b, 1).otherwise(0)).alias(f"__cc{b}")
                for b in range(n_bins)
            ],
        )
    )
    j = cur_agg.join(F.broadcast(ref_grid), keys, "left")

    pr = [
        (F.col(f"__rc{b}") + F.lit(0.5)) / (F.col("__rt") + F.lit(half))
        for b in range(n_bins)
    ]
    pc = [
        (F.col(f"__cc{b}") + F.lit(0.5)) / (F.col("__ct") + F.lit(half))
        for b in range(n_bins)
    ]
    psi = (pc[0] - pr[0]) * F.log(pc[0] / pr[0])
    for b in range(1, n_bins):
        psi = psi + (pc[b] - pr[b]) * F.log(pc[b] / pr[b])
    crc, ccc = [F.col("__rc0")], [F.col("__cc0")]
    for b in range(1, n_bins):
        crc.append(crc[-1] + F.col(f"__rc{b}"))
        ccc.append(ccc[-1] + F.col(f"__cc{b}"))
    gaps = [
        F.abs(
            crc[b].cast("double") / F.col("__rt")
            - ccc[b].cast("double") / F.col("__ct")
        )
        for b in range(n_bins)
    ]
    has_ref = F.col("__rt").isNotNull()
    return j.select(
        *group_cols,
        F.col("__w.start").alias("window_start"),
        F.when(has_ref, F.round(psi, 6)).alias("psi"),
        F.when(has_ref, F.round(F.greatest(*gaps), 6)).alias("ks"),
        F.col("__rt").cast("bigint").alias("n_ref"),
        F.col("__ct").cast("bigint").alias("n_cur"),
    )


#: widest measured dim for the unrolled streaming aggregation (r15 probe)
_WDRIFT_MAX_DIM = 1536


def windowed_embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    group_col: str,
    ts_col: str,
    duration: str = "1 hour",
    dim: int = 64,
    include_malformed_count: bool = False,
) -> DataFrame:
    """Vector-drift MONITORING: per (group, tumbling event-time window) of
    the CURRENT stream, the cosine between the group's PINNED reference
    centroid and the window's centroid — ``embedding_centroid_drift`` is
    the two-snapshot gate, this is the continuously-emitted score
    (completing the drift-family symmetry the scalar path already has via
    ``windowed_distribution_drift``).

    The SAME body runs in batch (tests, oracle) and under Structured
    Streaming: everything is ONE aggregation — per (group, window), the
    ``dim`` per-component integer sums are unrolled into ``dim`` sum
    columns (``element_at``, no explode — an exploded row-form would need
    a second aggregation and be streaming-illegal), and the cosine is a
    fixed-shape scalar expression over those columns. The reference side
    must be STATIC (asserted): its per-group centroid grid is a
    |groups|-row relation broadcast into the stream (stream-static join).

    Same determinism contract as the batch twin: components are rounded
    at 6 dp and scaled to exact BIGINTs before summation (per-(group,
    window, dim) sums are integers — order-insensitive across
    partitionings, micro-batching, and engines); cosine is
    scale-invariant, so it is taken directly on the integer sum vectors
    assembled in index order (the final fold runs in array order in both
    engines via the shared ``cosine`` expression); ``centroid_cos``
    rounds at 6 dp. A (group, window) whose group has NO reference rows
    (novel population) reports centroid_cos = NULL and n_ref = NULL —
    the "not comparable" sentinel, mirroring
    ``windowed_distribution_drift`` (the two-snapshot twin instead drops
    one-sided groups; a monitoring stream must surface them); windows
    with no current vectors emit no row (the output is current-driven).

    Malformed vectors: NULLs AND wrong-dimension vectors (size != dim)
    are excluded on both sides — pinned, not incidental. Under ANSI mode
    a short vector would otherwise CRASH the stream on ``element_at``
    (one bad record killing a monitoring query), and a long vector would
    silently truncate into the centroid; exclusion keeps the stream
    alive with defined semantics, and a mass dim change (encoder swap)
    surfaces as a collapsing ``n_cur``. (The two-snapshot batch twin
    ``embedding_centroid_drift`` posexplodes and needs no dim parameter;
    it assumes curated equal-dim snapshots.)
    ``include_malformed_count=True`` (r14 ADVICE: silent exclusion in a
    MONITOR can mask the upstream encoder bug it exists to catch) makes
    the exclusion observable: an extra ``n_malformed`` column counts the
    window's excluded current rows (NULL or wrong-dim vectors), computed
    in the SAME single aggregation (conditional counts/sums — still
    streaming-legal, still ANSI-safe because ``element_at`` only
    evaluates inside the well-formed branch), and windows whose rows are
    ALL malformed now surface (n_cur = 0, centroid_cos = NULL) instead
    of vanishing. The default keeps the original filter path and schema
    — registered oracles are unchanged.

    Shape at 100 TB: the stream is scanned once; the shuffle carries one
    row per (group, window) of width dim+1 (map-side combinable sums —
    vectors never move whole), the reference grid rides as a broadcast.
    Streaming state is the open windows only — watermark-evicted.

    Dim posture (r14 verdict missing #2, measured in
    ``scripts/probe_wdrift_dim_r15.py``): the unrolled aggregate's
    ANALYSIS cost grows superlinearly with ``dim`` (one-time per query:
    6 s at dim 64 → 14 s at 256 → 42 s at 768 → 70 s at 1536 on this
    host) while the per-batch RUN cost grows gently (3.9 s → 6.8 s per
    100k rows); both are live through dim 1536, the widest measured
    point, which is therefore the ASSERTED ceiling. Wider embeddings
    should use the batch twin (``embedding_centroid_drift`` posexplodes
    — no unroll, no ceiling) on snapshots, or monitor a fixed 1536-wide
    slice of the vector.

    Returns (group_col, window_start, centroid_cos, n_ref, n_cur
    [, n_malformed]).
    """
    from healthcare_rcm_etl_pipeline_spark.functions.vector import cosine

    if ref.isStreaming:
        raise ValueError("the reference snapshot must be a static DataFrame")
    if not 1 <= dim <= _WDRIFT_MAX_DIM:
        raise ValueError(
            f"dim={dim} outside the measured envelope (1..{_WDRIFT_MAX_DIM}): "
            "the unrolled streaming aggregation's analysis cost grows "
            "superlinearly with dim (probe_wdrift_dim_r15). For wider "
            "embeddings use the batch twin embedding_centroid_drift on "
            "snapshots, or monitor a fixed slice of the vector."
        )

    def _isum(i: int) -> F.Column:
        # same integerization as embedding_centroid_drift: round at 6 dp,
        # scale, round AGAIN at 0 dp before the bigint cast (double->bigint
        # casts truncate; other engines round)
        c = F.element_at(F.col(vec_col), i + 1).cast("double")
        return F.sum(
            F.round(F.round(c, 6) * F.lit(1_000_000.0), 0).cast("bigint")
        )

    well_formed = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    ref_grid = (
        ref.filter(well_formed)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__rt"),
            *[_isum(i).alias(f"__rs{i}") for i in range(dim)],
        )
    )
    if include_malformed_count:
        # conditional aggregation instead of a pre-filter: malformed rows
        # stay IN the groupBy (their count is the monitoring signal) but
        # contribute NULL to every sum — element_at is only evaluated in
        # the well-formed branch, so ANSI stays safe for short vectors
        cur_agg = cur.groupBy(
            group_col, F.window(ts_col, duration).alias("__w")
        ).agg(
            F.count(F.when(well_formed, F.lit(1))).alias("__ct"),
            F.count(F.when(~well_formed, F.lit(1))).alias("__cm"),
            *[
                F.sum(
                    F.when(
                        well_formed,
                        F.round(
                            F.round(
                                F.element_at(F.col(vec_col), i + 1).cast("double"),
                                6,
                            )
                            * F.lit(1_000_000.0),
                            0,
                        ).cast("bigint"),
                    )
                ).alias(f"__cs{i}")
                for i in range(dim)
            ],
        )
    else:
        cur_agg = (
            cur.filter(well_formed)
            .groupBy(group_col, F.window(ts_col, duration).alias("__w"))
            .agg(
                F.count(F.lit(1)).alias("__ct"),
                *[_isum(i).alias(f"__cs{i}") for i in range(dim)],
            )
        )
    j = cur_agg.join(F.broadcast(ref_grid), group_col, "left")
    rv = F.array(*[F.col(f"__rs{i}").cast("double") for i in range(dim)])
    cv = F.array(*[F.col(f"__cs{i}").cast("double") for i in range(dim)])
    has_ref = F.col("__rt").isNotNull()
    comparable = has_ref & (F.col("__ct") > 0) if include_malformed_count else has_ref
    cols = [
        group_col,
        F.col("__w.start").alias("window_start"),
        F.when(comparable, F.round(cosine(rv, cv), 6)).alias("centroid_cos"),
        F.col("__rt").cast("bigint").alias("n_ref"),
        F.col("__ct").cast("bigint").alias("n_cur"),
    ]
    if include_malformed_count:
        cols.append(F.col("__cm").cast("bigint").alias("n_malformed"))
    return j.select(*cols)


def embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    group_col: str,
) -> DataFrame:
    """Vector-drift report between two embedding snapshots: per group, the
    cosine between the REFERENCE centroid and the CURRENT centroid — the
    embedding twin of ``distribution_drift`` (embedding-model swaps,
    encoder regressions, and population shift all show up as centroid
    rotation long before scalar metrics move).

    Determinism / oracle-exactness: each component is rounded at 6 dp and
    scaled to an exact BIGINT before summation, so the per-(group, dim)
    sums are integers — order-insensitive across partitionings and
    engines. Cosine is scale-invariant, so it is taken directly on the
    integer sum vectors (no division by n, which would reintroduce float
    rounding); the fold order of the final 64-term dot product is the
    array order in both engines. Only groups present on BOTH sides are
    reported (a one-sided centroid has no drift to measure).

    Shape at 100 TB: one posexplode per side shuffles (group, dim) keyed
    partial sums — map-side combinable, the shuffle carries
    |groups| x dim rows — then a |groups|-row join. The corpus is scanned
    once per side; vectors never move whole.

    Returns (group_col, centroid_cos, n_ref, n_cur).
    """
    from healthcare_rcm_etl_pipeline_spark.functions.vector import as_double_vec, cosine

    def _centroid(df: DataFrame, n_name: str, v_name: str) -> DataFrame:
        exploded = df.select(
            F.col(group_col),
            F.posexplode(as_double_vec(vec_col)).alias("__pos", "__v"),
        )
        # round AGAIN at 0 dp before the bigint cast: Spark's double->bigint
        # cast truncates while other engines round — the explicit round
        # makes the integerization engine-identical (same device as the
        # MMR fixed-point scaling).
        sums = exploded.groupBy(group_col, "__pos").agg(
            F.sum(
                F.round(F.round(F.col("__v"), 6) * F.lit(1_000_000.0), 0).cast("bigint")
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        return sums.groupBy(group_col).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__s"))),
                lambda x: x["__s"].cast("double"),
            ).alias(v_name),
            F.max("__n").cast("bigint").alias(n_name),
        )

    r = _centroid(ref, "n_ref", "__rv")
    c = _centroid(cur, "n_cur", "__cv")
    return (
        r.join(c, group_col)
        .select(
            group_col,
            F.round(cosine("__rv", "__cv"), 6).alias("centroid_cos"),
            "n_ref",
            "n_cur",
        )
    )
