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

Checkpoint/base lifecycle: the stream's epoch_id counter lives in the
CHECKPOINT; the replay marker lives in the BASE. If they were coupled only
by the raw epoch number, pointing a FRESH checkpoint at an existing base
would restart epoch ids at 0 and every new batch would be silently skipped
as a 'replay'. The marker therefore carries a RUN TOKEN (minted once per
checkpoint instance and stored inside the checkpoint dir) plus an epoch
OFFSET: same token -> physical epoch = offset + epoch_id, replay gate as
usual; different token (new checkpoint against an existing base) -> the
stream REBINDS, mapping its first batch to the next free physical epoch.
Ingestion continues where the corpus left off instead of dropping data.

This composes three independently-tested pieces: the incremental LSH probe
(operators/dedup.py), the persisted band index layout, and the _EPOCH
marker recipe shared with ``events.make_upsert_batch_fn``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.operators import dedup, graph
from healthcare_rcm_etl_pipeline_spark.sources import sinks


def _read_marker(spark: SparkSession, base: str) -> tuple[str, int, int]:
    """(run_token, epoch_offset, last_physical_epoch). Legacy int-only
    markers parse as token='' offset=0 — behaviorally identical to the
    pre-token recipe."""
    raw = sinks.read_text_marker(spark, f"{base}/_EPOCH", "")
    if not raw:
        return "", 0, -1
    parts = raw.split()
    if len(parts) == 1:
        return "", 0, int(parts[0])
    token = "" if parts[0] == "-" else parts[0]
    return token, int(parts[1]), int(parts[2])


def _write_marker(
    spark: SparkSession, base: str, token: str, offset: int, last: int
) -> None:
    sinks.write_text_marker(spark, f"{base}/_EPOCH", f"{token or '-'} {offset} {last}")


def _read_epoch(spark: SparkSession, base: str) -> int:
    """Last COMMITTED physical epoch (-1 before the first)."""
    return _read_marker(spark, base)[2]


def checkpoint_run_token(spark: SparkSession, checkpoint: str) -> str:
    """The run token for a checkpoint instance: minted on first use, stored
    INSIDE the checkpoint dir so it lives and dies with the stream's own
    epoch counter. A deleted/re-created checkpoint gets a fresh token, which
    is exactly the signal the ingest marker needs to rebind epoch numbering
    instead of misreading restarted epoch ids as replays."""
    path = f"{checkpoint}/_INGEST_RUN_TOKEN"
    token = sinks.read_text_marker(spark, path, "")
    if not token:
        token = uuid.uuid4().hex[:16]
        sinks.write_text_marker(spark, path, token)
    return token


def _read_epoched(spark: SparkSession, path: str, max_epoch: int | None) -> DataFrame | None:
    """Read an epoch-partitioned dataset, None if it doesn't exist yet.

    ``max_epoch`` filters to COMMITTED epochs only (epoch <= marker): a
    crash after writing ``epoch=N`` but before advancing the marker leaves
    ghost files that the replay of epoch N must not see — reading them
    would make the batch collide with its own partial write, verify
    against itself at jaccard 1.0, and dedup the whole batch away.
    Existence is probed via the Hadoop FS API (not by pattern-matching a
    read failure's message, which drifts across Spark versions); any READ
    failure on an existing path (corrupt footer, permissions, transient
    storage error) propagates — silently treating those as 'no corpus yet'
    would skip cross-corpus dedup and ingest duplicates without a trace."""
    if not sinks.path_exists(spark, path):
        return None
    df = spark.read.parquet(path)
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
    run_token: str | None = None,
):
    """foreachBatch body implementing the gated ingestion described above.

    ``run_token`` identifies the checkpoint instance driving this stream
    (see module docstring). None keeps raw-epoch semantics — correct only
    when the caller guarantees the checkpoint and base live and die
    together; ``dedup_ingest_stream`` always passes a token."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        token, offset, last = _read_marker(spark, base)
        if run_token is None or run_token == token:
            physical = offset + epoch_id
            if physical <= last:
                return  # replayed epoch: already fully applied
            bound = token if run_token is None else run_token
        else:
            # new checkpoint instance against an existing base: rebind this
            # stream's epoch numbering to continue after the last commit.
            physical = last + 1
            offset = physical - epoch_id
            bound = run_token

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
            batch.write.mode("overwrite").parquet(f"{base}/docs/epoch={physical}")
            dedup.minhash_band_table(
                batch, text_col, id_col, k=k, bands=bands, n=n
            ).write.mode("overwrite").parquet(f"{base}/bands/epoch={physical}")
        finally:
            batch.unpersist()
        _write_marker(spark, base, bound, offset, physical)

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
    token = checkpoint_run_token(stream_df.sparkSession, checkpoint)
    return (
        stream_df.writeStream.foreachBatch(
            make_dedup_ingest_batch_fn(
                base, text_col, id_col, run_token=token, **lsh_kwargs
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
