"""Streaming corpus ingestion with near-dup gating — the production shape
for a continuously-growing training corpus.

Per micro-batch (foreachBatch):

1. WITHIN-batch dedup: exact (canonical-md5 min-id survivor) then near-dup
   (minhash-LSH pairs -> connected components -> min-id survivor), so a
   batch carrying its own duplicates contributes one copy.
2. CROSS-corpus dedup: the batch survivors probe the PERSISTED band index
   (``minhash_band_table`` rows accumulated from every prior epoch) via
   ``minhash_lsh_pairs_incremental`` — only candidate docs are ever
   shingled on either side (the index is read, never rebuilt; base text is
   fetched just for bucket-colliding candidates). Batch docs with a
   confirmed base near-dup are dropped.
3. APPEND: surviving docs and THEIR band rows land under per-epoch
   partition directories (``docs/epoch=N/``, ``bands/epoch=N/``), then the
   ``_EPOCH`` marker advances.

Exactly-once under replay: foreachBatch re-delivers a failed micro-batch
with the SAME epoch_id; epochs at-or-below the marker are skipped, and a
partially-written epoch is safe because the re-run OVERWRITES the same
``epoch=N`` directories rather than appending — the write is idempotent
per epoch, the marker only gates the skip. (Plain ``mode("append")`` would
double-apply a partially-failed epoch; the per-epoch overwrite is what
upgrades the recipe to exactly-once.)

This composes three independently-tested pieces: the incremental LSH probe
(operators/dedup.py), the persisted band index layout, and the _EPOCH
marker recipe shared with ``events.make_upsert_batch_fn``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators import dedup, graph
from healthcare_rcm_etl_pipeline_spark.sources import sinks


def _read_epoch(spark: SparkSession, base: str) -> int:
    return sinks.read_int_marker(spark, f"{base}/_EPOCH", -1)


def _write_epoch(spark: SparkSession, base: str, epoch_id: int) -> None:
    sinks.write_int_marker(spark, f"{base}/_EPOCH", epoch_id)


def _read_epoched(spark: SparkSession, path: str, max_epoch: int | None) -> DataFrame | None:
    """Read an epoch-partitioned dataset, None if it doesn't exist yet.

    ``max_epoch`` filters to COMMITTED epochs only (epoch <= marker): a
    crash after writing ``epoch=N`` but before advancing the marker leaves
    ghost files that the replay of epoch N must not see — reading them
    would make the batch collide with its own partial write, verify
    against itself at jaccard 1.0, and dedup the whole batch away. Only a
    genuinely-missing path maps to None; any other read failure (corrupt
    footer, permissions, transient storage error) propagates — silently
    treating those as 'no corpus yet' would skip cross-corpus dedup and
    ingest duplicates without a trace."""
    try:
        df = spark.read.parquet(path)
    except Exception as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    if max_epoch is not None:
        df = df.filter(F.col("epoch") <= max_epoch)
    return df.drop("epoch")


def read_corpus(
    spark: SparkSession, base: str, max_epoch: int | None = None
) -> DataFrame | None:
    """All ingested docs across committed epochs (None before the first)."""
    return _read_epoched(spark, f"{base}/docs", max_epoch)


def read_band_index(
    spark: SparkSession, base: str, max_epoch: int | None = None
) -> DataFrame | None:
    """The accumulated minhash band index across committed epochs."""
    return _read_epoched(spark, f"{base}/bands", max_epoch)


def make_dedup_ingest_batch_fn(
    base: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    verify_threshold: float = 0.5,
):
    """foreachBatch body implementing the gated ingestion described above."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        last = _read_epoch(spark, base)
        if epoch_id <= last:
            return  # replayed epoch: already fully applied

        # 1. within-batch: exact, then near-dup clusters -> min-id survivor
        keep = dedup.exact_dedup(batch_df, text_col, id_col).select(
            F.col("keep_id").alias(id_col)
        )
        batch = batch_df.join(keep, id_col, "left_semi")
        pairs = dedup.minhash_lsh_pairs(
            batch, text_col, id_col, k=k, bands=bands, n=n,
            verify_threshold=verify_threshold,
        )
        losers = (
            graph.connected_components(pairs)
            .filter(F.col("doc") != F.col("component"))
            .select(F.col("doc").alias(id_col))
        )
        batch = batch.join(losers, id_col, "left_anti")

        # 2. cross-corpus: probe the persisted band index; only candidate
        # docs are shingled (operators/dedup.py semi-join guarantee).
        # max_epoch=last: a replay of a partially-committed epoch must not
        # see its own ghost files, or every batch doc would collide with
        # itself and the anti-join would silently drop the whole batch.
        corpus = read_corpus(spark, base, max_epoch=last)
        index = read_band_index(spark, base, max_epoch=last)
        if corpus is not None and index is not None:
            dup_new = (
                dedup.minhash_lsh_pairs_incremental(
                    batch, corpus, text_col, id_col,
                    k=k, bands=bands, n=n, verify_threshold=verify_threshold,
                    base_bands=index,
                )
                .select(F.col("doc_new").alias(id_col))
                .distinct()
            )
            batch = batch.join(dup_new, id_col, "left_anti")

        # 3. per-epoch overwrite (idempotent on replay), marker last.
        # persist: the docs write and the band-table write are two actions
        # over the same lineage (LSH + connected components + cross probe) —
        # without it the whole dedup graph executes twice per epoch.
        batch = batch.persist()
        try:
            batch.write.mode("overwrite").parquet(f"{base}/docs/epoch={epoch_id}")
            dedup.minhash_band_table(
                batch, text_col, id_col, k=k, bands=bands, n=n
            ).write.mode("overwrite").parquet(f"{base}/bands/epoch={epoch_id}")
        finally:
            batch.unpersist()
        _write_epoch(spark, base, epoch_id)

    return apply_batch


def dedup_ingest_stream(
    stream_df: DataFrame,
    base: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
):
    """Drive a document stream through the near-dup-gated ingestion."""
    return (
        stream_df.writeStream.foreachBatch(
            make_dedup_ingest_batch_fn(base, text_col, id_col, **lsh_kwargs)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
