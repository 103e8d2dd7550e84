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
    fs, marker = sinks._fs_path(spark, f"{base}/_EPOCH")
    if not fs.exists(marker):
        return -1
    stream = fs.open(marker)
    try:
        data = []
        b = stream.read()
        while b != -1 and len(data) < 32:
            data.append(b)
            b = stream.read()
    finally:
        stream.close()
    return int(bytes(data).decode().strip() or "-1")


def _write_epoch(spark: SparkSession, base: str, epoch_id: int) -> None:
    fs, tmp = sinks._fs_path(spark, f"{base}/_EPOCH.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(epoch_id).encode()))
    finally:
        out.close()
    _, cur = sinks._fs_path(spark, f"{base}/_EPOCH")
    fs.delete(cur, False)
    fs.rename(tmp, cur)


def read_corpus(spark: SparkSession, base: str) -> DataFrame | None:
    """All ingested docs across epochs (None before the first epoch)."""
    try:
        return spark.read.parquet(f"{base}/docs").drop("epoch")
    except Exception:
        return None


def read_band_index(spark: SparkSession, base: str) -> DataFrame | None:
    """The accumulated minhash band index across epochs."""
    try:
        return spark.read.parquet(f"{base}/bands").drop("epoch")
    except Exception:
        return None


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
        if epoch_id <= _read_epoch(spark, base):
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
        # docs are shingled (operators/dedup.py semi-join guarantee)
        corpus = read_corpus(spark, base)
        index = read_band_index(spark, base)
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

        # 3. per-epoch overwrite (idempotent on replay), marker last
        batch.write.mode("overwrite").parquet(f"{base}/docs/epoch={epoch_id}")
        dedup.minhash_band_table(
            batch, text_col, id_col, k=k, bands=bands, n=n
        ).write.mode("overwrite").parquet(f"{base}/bands/epoch={epoch_id}")
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
