"""Corpus-preparation operators for LLM training-data pipelines.

Beyond-reference surface (no analog in the reference's ETL): the operations
that sit between "cleaned documents" and "training shards" in a pre-training
data pipeline —

- :func:`chunk_documents` — split each document into overlapping
  fixed-token-window chunks (context-window preparation).
- :func:`pack_token_shards` — assign documents to fixed token-budget shards
  by running token count within a natural partition (sequence/shard packing).
- :func:`shuffle_shards` — deterministic global shuffle: hash-derived
  pseudo-random total order -> shard + position, reproducible across runs
  and engines (no ``rand()``, stable under task retry).
- :func:`contamination_stats` — benchmark-contamination detection: per
  corpus document, how many distinct word n-grams it shares with a
  (small) benchmark set. The benchmark side is broadcast.
- :func:`repetition_stats` — Gopher-style repetition quality signals
  (Rae et al. 2021, arXiv:2112.11446 §A1.1): fraction of n-gram positions
  occupied by the most frequent n-gram, and by n-grams occurring more than
  once. High values => boilerplate / degenerate text.

All hot paths are pure ``pyspark.sql.functions`` column expressions plus
explode/groupBy — JVM-side, codegen'd, no Python UDFs. Every operator keys
its shuffles on (doc_id) or (doc_id, gram) — never on raw document text —
so shuffled bytes stay small at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.functions.text import (
    ngram_array,
    shingles_from_tokens,
    token_count_ws,
    tokens,
)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows (context-window prep).

    Windows start at token positions 1, 1+stride, 1+2*stride, ...; each
    covers ``chunk_tokens`` tokens (the tail windows are shorter). A tail
    window whose content is entirely contained in the previous window
    (length <= chunk_tokens - stride) is dropped as redundant; the first
    window is always kept, so every document yields >= 1 chunk and every
    token appears in >= 1 chunk.

    Per-document pure array expressions (transform over a start-position
    sequence + slice) followed by one explode — no shuffle at all: chunking
    is embarrassingly parallel and stays that way at 100 TB.

    Returns (id_col, chunk_id, chunk_text, n_tokens).
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = tokens(text_col)
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    windows = F.transform(
        starts,
        lambda s: F.struct(
            F.floor((s - 1) / stride).alias("chunk_id"),
            F.slice(F.col("__toks"), s, chunk_tokens).alias("ctoks"),
        ),
    )
    kept = F.filter(
        windows,
        lambda w: (w["chunk_id"] == 0)
        | (F.size(w["ctoks"]) > chunk_tokens - stride),
    )
    return (
        df.select(id_col, toks.alias("__toks"))
        .select(id_col, F.explode(kept).alias("__w"))
        .select(
            id_col,
            F.col("__w.chunk_id").alias("chunk_id"),
            F.concat_ws(" ", F.col("__w.ctoks")).alias("chunk_text"),
            F.size("__w.ctoks").cast("bigint").alias("n_tokens"),
        )
    )


def pack_token_shards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    partition_col: str = "source",
) -> DataFrame:
    """Assign documents to fixed token-budget shards by running token count.

    Documents are ordered deterministically (by ``id_col``) within each
    ``partition_col`` group; each document lands in the shard where its
    running token count starts: ``shard_id = (cumsum - n_tokens) // budget``.
    This is the "fill shards by running token count" packing used when
    materializing pre-training shards — a document may straddle a budget
    boundary (the budget is a fill target, not a hard cap), which keeps the
    assignment a pure prefix-sum: one window per partition group, no
    sequential driver loop.

    At 100 TB you pack within natural partitions (source, date, ...) so no
    single window partition exceeds an executor; a global (un-partitioned)
    pack would serialize into one task and is deliberately not offered.

    Returns (id_col, partition_col, n_tokens, shard_id, shard_pos).
    """
    w = Window.partitionBy(partition_col).orderBy(id_col)
    d = df.select(
        id_col, partition_col, token_count_ws(text_col).cast("bigint").alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(w)
    d = d.withColumn("shard_id", F.floor((cum - F.col("n_tokens")) / budget))
    return d.withColumn(
        "shard_pos",
        F.row_number().over(
            Window.partitionBy(partition_col, "shard_id").orderBy(id_col)
        ).cast("bigint"),
    )


def _md5_long(col: Column) -> Column:
    """60-bit nonnegative long from an md5 prefix — portable pseudo-random
    key (any md5-capable engine reproduces it bit-for-bit)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Order = md5(salt || id) — a reproducible pseudo-random permutation
    (change ``salt`` to re-shuffle between epochs). ``shard_id = key mod
    n_shards``; ``shard_pos`` = rank within the shard. No ``rand()``:
    results are identical under task retry, across runs, and across engines
    (the oracle recomputes the same permutation in SQL).

    One hash-partitioned exchange on shard_id + an in-shard sort — exactly
    the shuffle a shard write requires anyway; rank is per-shard, never a
    global window. Returns (id_col, shard_id, shard_pos).
    """
    key = _md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    d = df.select(id_col, key.alias("__k"))
    d = d.withColumn("shard_id", F.pmod(F.col("__k"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard_id").orderBy("__k", id_col)
    return d.select(
        id_col,
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
    )


def contamination_stats(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark-contamination detection via shared word n-grams.

    For every corpus document: how many of its DISTINCT word n-grams appear
    anywhere in the benchmark set (``n_hits``), its total distinct n-grams
    (``n_shingles``), the ratio, and a ``contaminated`` flag at
    ``n_hits >= min_overlap`` — the standard n-gram-overlap decontamination
    check run before training (e.g. GPT-3 appendix C).

    Scale shape: the benchmark side (test sets — MBs, not TBs) collapses to
    a DISTINCT shingle set and is **broadcast**; the corpus side explodes to
    (doc_id, shingle) and semi-joins against it map-side, then re-aggregates
    by doc_id. The 100 TB corpus is never shuffled on text — only the
    (doc_id, count) pairs move.

    Returns (id_col, n_shingles, n_hits, overlap_ratio, contaminated).
    """
    base = df.select(
        id_col,
        shingles_from_tokens(tokens(text_col), n).alias("__sh"),
    ).select(id_col, F.size("__sh").cast("bigint").alias("n_shingles"), "__sh")
    bench_sh = (
        bench.select(F.explode(shingles_from_tokens(tokens(text_col), n)).alias("shingle"))
        .distinct()
    )
    hits = (
        base.select(id_col, F.explode("__sh").alias("shingle"))
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    out = (
        base.drop("__sh")
        .join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("bigint"))
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_hits",
        (F.col("n_hits") / F.nullif(F.col("n_shingles").cast("double"), F.lit(0.0))).alias(
            "overlap_ratio"
        ),
        (F.col("n_hits") >= min_overlap).alias("contaminated"),
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """The removal half of decontamination: returns the CORPUS ROWS (all
    columns) whose documents are NOT contaminated per
    ``contamination_stats`` — i.e. fewer than ``min_overlap`` distinct word
    n-grams shared with the benchmark set. Detection is a broadcast
    semi-join against the benchmark shingle set; removal is one more
    anti-join of the corpus against the flagged ids, so the full pipeline
    still never shuffles the corpus on text."""
    flagged = (
        contamination_stats(df, bench, text_col, id_col, n=n, min_overlap=min_overlap)
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return df.join(flagged, id_col, "left_anti")


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    top_frac_max: float = 0.20,
    dup_frac_max: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1).

    Per document:
    - ``top_ngram_frac``  — fraction of ``top_n``-gram positions occupied by
      the single most frequent ``top_n``-gram;
    - ``dup_ngram_frac``  — fraction of ``dup_n``-gram positions whose gram
      occurs more than once in the document;
    - ``flagged`` — either fraction over its threshold (boilerplate /
      degenerate-repetition filter).

    Positional (non-distinct) n-grams explode to (doc_id, gram) and count
    with a map-side-combined groupBy — two keyed aggregations re-joined on
    doc_id. Shuffles carry only (id, short gram, count); documents with too
    few tokens for a window produce zero fractions (never null).

    Returns (id_col, n_tokens, top_ngram_frac, dup_ngram_frac, flagged).
    """
    toks = df.select(id_col, tokens(text_col).alias("__t"))

    def frac(n: int, mode: str, out: str) -> DataFrame:
        grams = toks.select(
            id_col, F.explode(ngram_array(F.col("__t"), n)).alias("g")
        )
        counts = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        per_doc = counts.groupBy(id_col).agg(
            F.sum("c").alias("__total"),
            (F.max("c") if mode == "top" else F.sum(F.when(F.col("c") > 1, F.col("c")))).alias(
                "__part"
            ),
        )
        return per_doc.select(
            id_col,
            (
                F.coalesce(F.col("__part"), F.lit(0)) / F.col("__total").cast("double")
            ).alias(out),
        )

    base = toks.select(id_col, F.size("__t").cast("bigint").alias("n_tokens"))
    out = (
        base.join(frac(top_n, "top", "top_ngram_frac"), id_col, "left")
        .join(frac(dup_n, "dup", "dup_ngram_frac"), id_col, "left")
        .withColumn("top_ngram_frac", F.coalesce("top_ngram_frac", F.lit(0.0)))
        .withColumn("dup_ngram_frac", F.coalesce("dup_ngram_frac", F.lit(0.0)))
    )
    return out.withColumn(
        "flagged",
        (F.col("top_ngram_frac") > top_frac_max) | (F.col("dup_ngram_frac") > dup_frac_max),
    )
