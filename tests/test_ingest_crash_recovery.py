"""Crash-safety of the ingest-base maintenance ops (streaming/ingest.py
purge_ids / compact_epochs): both swap rewritten directories into place via
rename-aside (trash) + rename-commit, so a crash at ANY step leaves a full
copy of every row recoverable. Each test manually reproduces one crash
state on disk, then asserts recover_base (run on entry by both ops)
restores a consistent base with zero data loss.

Round-5 ADVICE regression: the old order was delete-live-then-rename-tmp,
so a crash between the delete and the rename permanently destroyed the
partition's kept rows (purge) or the folded epochs' rows (compact)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from healthcare_rcm_etl_pipeline_spark.streaming import ingest

LONG_A = " ".join(f"w{i}" for i in range(30))
LONG_B = " ".join(f"x{i}" for i in range(25))
LONG_C = " ".join(f"y{i}" for i in range(28))
LONG_D = " ".join(f"v{i}" for i in range(27))


def _build_base(spark, base, epochs):
    fn = ingest.make_dedup_ingest_batch_fn(base)
    for e, rows in enumerate(epochs):
        fn(spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows]), e)


def _ids(spark, base):
    return sorted(
        r.doc_id for r in ingest.read_corpus(spark, base).select("doc_id").collect()
    )


def _band_docs(spark, base):
    return sorted(
        r.doc
        for r in ingest.read_band_index(spark, base).select("doc").distinct().collect()
    )


def _no_hidden_dirs(base):
    for sub in ("docs", "bands"):
        root = f"{base}/{sub}"
        if os.path.isdir(root):
            assert not [d for d in os.listdir(root) if d.startswith(".")], (
                f"leftover maintenance dirs under {root}"
            )


def _write_purge_tmp(spark, base, epoch, drop_ids):
    """The kept-rows rewrite purge_ids stages before any rename."""
    part = f"{base}/docs/epoch={epoch}"
    tmp = f"{base}/docs/.epoch={epoch}.purge_tmp"
    spark.read.parquet(part).filter(~F.col("doc_id").isin(drop_ids)).write.mode(
        "overwrite"
    ).parquet(tmp)
    return part, tmp


def test_purge_crash_after_tmp_write_rolls_back(spark, tmp_path):
    """Crash after step 1 (tmp written, live untouched): the stale tmp is
    dropped and the re-run purges from the intact live partition."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)], [(11, LONG_C)]])
    _write_purge_tmp(spark, base, 0, [1])

    got = ingest.recover_base(spark, base)
    assert got["docs"] == 1  # the stale tmp
    assert _ids(spark, base) == [1, 2, 11]  # nothing lost, nothing purged
    _no_hidden_dirs(base)

    assert ingest.purge_ids(spark, base, [1]) == {"docs": 1, "bands": 1}
    assert _ids(spark, base) == [2, 11]
    assert _band_docs(spark, base) == [2, 11]
    _no_hidden_dirs(base)


def test_purge_crash_between_renames_completes_forward(spark, tmp_path):
    """Crash between step 2 (live renamed aside) and step 3 (tmp renamed
    in): the live dir is GONE — the old delete-then-rename order lost the
    kept rows here. Recovery completes the swap from the fully-written
    tmp; the re-run then finishes the bands purge."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)], [(11, LONG_C)]])
    part, tmp = _write_purge_tmp(spark, base, 0, [1])
    os.rename(part, f"{base}/docs/.epoch=0.purge_trash")
    assert not os.path.exists(part)

    assert ingest.purge_ids(spark, base, [1]) == {"docs": 0, "bands": 1}
    assert _ids(spark, base) == [2, 11]  # kept row 2 survived the crash
    assert _band_docs(spark, base) == [2, 11]
    _no_hidden_dirs(base)


def test_purge_crash_before_trash_delete_drops_trash(spark, tmp_path):
    """Crash between step 3 (commit rename) and step 4 (trash delete):
    the swap is committed; recovery just removes the redundant trash."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    part, tmp = _write_purge_tmp(spark, base, 0, [1])
    os.rename(part, f"{base}/docs/.epoch=0.purge_trash")
    os.rename(tmp, part)

    got = ingest.recover_base(spark, base)
    assert got["docs"] == 1
    assert _ids(spark, base) == [2]
    _no_hidden_dirs(base)
    # re-run completes the untouched datasets (bands) idempotently
    ingest.purge_ids(spark, base, [1])
    assert _band_docs(spark, base) == [2]


def test_purge_trash_without_tmp_restores_live(spark, tmp_path):
    """Defensive path: only the trash exists (tmp vanished out-of-band).
    The trash IS the partition — roll it back verbatim."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    part = f"{base}/docs/epoch=0"
    os.rename(part, f"{base}/docs/.epoch=0.purge_trash")

    assert ingest.recover_base(spark, base)["docs"] == 1
    assert _ids(spark, base) == [1, 2]
    _no_hidden_dirs(base)


def _stage_compact(spark, base, sub="docs"):
    """Stage compaction up to (but not including) the dir moves: the folded
    rewrite lands in .compact_tmp, exactly as compact_epochs does."""
    root = f"{base}/{sub}"
    last = ingest._read_epoch(spark, base)
    spark.read.parquet(root).filter(F.col("epoch") <= last).drop(
        "epoch"
    ).write.mode("overwrite").parquet(f"{root}/.compact_tmp")
    return root, last


def test_compact_crash_mid_move_rolls_back_and_reruns(spark, tmp_path):
    """Crash after SOME committed dirs moved to the trash: the old code's
    delete loop made this state unrecoverable (the re-run folded only the
    surviving dirs). Recovery restores the moved dirs and the re-run
    compacts the complete base."""
    base = str(tmp_path / "corpus")
    _build_base(
        spark, base, [[(1, LONG_A)], [(11, LONG_B)], [(21, LONG_C)]]
    )
    root, last = _stage_compact(spark, base)
    os.makedirs(f"{root}/.compact_trash")
    os.rename(f"{root}/epoch=0", f"{root}/.compact_trash/epoch=0")
    os.rename(f"{root}/epoch=1", f"{root}/.compact_trash/epoch=1")
    assert not os.path.exists(f"{root}/epoch=0")

    got = ingest.compact_epochs(spark, base)
    assert got == {"docs": 3, "bands": 3}
    assert _ids(spark, base) == [1, 11, 21]  # epochs 0,1 recovered, folded
    assert [d for d in os.listdir(root) if d.startswith("epoch=")] == [
        f"epoch={last}"
    ]
    _no_hidden_dirs(base)


def test_compact_crash_after_commit_drops_trash(spark, tmp_path):
    """Crash after the tmp->epoch=last commit rename but before the trash
    delete: recovery must NOT roll back (the commit already happened);
    it just drops the redundant trash."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A)], [(11, LONG_B)], [(21, LONG_C)]])
    root, last = _stage_compact(spark, base)
    os.makedirs(f"{root}/.compact_trash")
    for d in [d for d in os.listdir(root) if d.startswith("epoch=")]:
        os.rename(f"{root}/{d}", f"{root}/.compact_trash/{d}")
    os.rename(f"{root}/.compact_tmp", f"{root}/epoch={last}")

    assert ingest.recover_base(spark, base)["docs"] == 1
    assert _ids(spark, base) == [1, 11, 21]
    assert [d for d in os.listdir(root) if d.startswith("epoch=")] == [
        f"epoch={last}"
    ]
    _no_hidden_dirs(base)
    # the other dataset (bands) still compacts normally afterwards
    got = ingest.compact_epochs(spark, base)
    assert got["bands"] == 3 and got["docs"] == 0
    assert _band_docs(spark, base) == [1, 11, 21]


def test_compact_stale_tmp_alone_is_dropped(spark, tmp_path):
    """Crash before any move: only .compact_tmp exists; it is stale (the
    live dirs are intact) and is simply regenerated by the re-run."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A)], [(11, LONG_B)]])
    root, last = _stage_compact(spark, base)
    assert os.path.isdir(f"{root}/.compact_tmp")

    got = ingest.compact_epochs(spark, base)
    assert got == {"docs": 2, "bands": 2}
    assert _ids(spark, base) == [1, 11]
    _no_hidden_dirs(base)


def test_ingestion_continues_after_each_recovery(spark, tmp_path):
    """End-to-end: crash -> recover -> the base keeps ingesting with
    cross-corpus dedup intact (the index reflects the recovered state)."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    part, tmp = _write_purge_tmp(spark, base, 0, [2])
    os.rename(part, f"{base}/docs/.epoch=0.purge_trash")

    ingest.purge_ids(spark, base, [2])  # recovers + finishes the purge
    fn = ingest.make_dedup_ingest_batch_fn(base)
    # 30 is a near-dup of surviving doc 1 -> dropped; 31 ~ purged doc 2 ->
    # must be re-ingestable (its index rows are gone); 32 genuinely new
    fn(
        spark.createDataFrame(
            [
                Row(doc_id=30, text=LONG_A + " tail"),
                Row(doc_id=31, text=LONG_B),
                Row(doc_id=32, text=LONG_D),
            ]
        ),
        1,
    )
    assert _ids(spark, base) == [1, 31, 32]


def test_ingest_batch_self_heals_before_reading(spark, tmp_path):
    """A crashed purge followed directly by an INGEST batch (no
    maintenance re-run in between): the batch fn must recover the
    half-swapped partition before probing the corpus, or it would dedup
    against a view missing the kept rows."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    # crash between the purge renames: live epoch dir gone, trash + tmp left
    part, tmp = _write_purge_tmp(spark, base, 0, [1])
    os.rename(part, f"{base}/docs/.epoch=0.purge_trash")

    fn = ingest.make_dedup_ingest_batch_fn(base)
    # 30 near-dups the KEPT doc 2 — only a recovered view can drop it
    fn(
        spark.createDataFrame(
            [Row(doc_id=30, text=LONG_B + " tail"), Row(doc_id=31, text=LONG_D)]
        ),
        1,
    )
    assert _ids(spark, base) == [2, 31]
    _no_hidden_dirs(base)


def test_maintenance_lock_blocks_second_writer(spark, tmp_path):
    """Single-writer enforcement (round-6 ADVICE): a second maintenance op
    must refuse to run while the lock is held — its recover_base would
    otherwise classify the first writer's in-flight tmp as stale and
    delete it mid-swap."""
    import pytest

    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    open(f"{base}/{ingest._MAINT_LOCK}", "w").close()

    with pytest.raises(ingest.MaintenanceLockHeld):
        ingest.purge_ids(spark, base, [1])
    with pytest.raises(ingest.MaintenanceLockHeld):
        ingest.compact_epochs(spark, base)
    # nothing was touched
    assert _ids(spark, base) == [1, 2]

    # operator confirms the holder is dead -> steal proceeds and releases
    assert ingest.purge_ids(spark, base, [1], steal_lock=True) == {
        "docs": 1,
        "bands": 1,
    }
    assert _ids(spark, base) == [2]
    assert not os.path.exists(f"{base}/{ingest._MAINT_LOCK}")


def test_batch_recover_skips_while_lock_held(spark, tmp_path):
    """While a maintenance op holds the lock, the streaming batch path's
    recover_base must NOT touch the op's in-flight tmp/trash dirs (they
    are live protocol state, not crash leftovers)."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    part, tmp = _write_purge_tmp(spark, base, 0, [1])
    open(f"{base}/{ingest._MAINT_LOCK}", "w").close()

    assert ingest.recover_base(spark, base) == {}  # skipped, not healed
    assert os.path.isdir(tmp)  # in-flight tmp untouched

    os.remove(f"{base}/{ingest._MAINT_LOCK}")
    assert ingest.recover_base(spark, base)["docs"] == 1  # now it heals
    _no_hidden_dirs(base)


def test_lock_released_after_success_and_failure(spark, tmp_path):
    """The lock must not leak: released after a normal run, and after an
    in-op exception (at which point no writer is active, so the next
    caller may safely take it without stealing)."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    ingest.compact_epochs(spark, base)
    assert not os.path.exists(f"{base}/{ingest._MAINT_LOCK}")
    ingest.purge_ids(spark, base, [999])
    assert not os.path.exists(f"{base}/{ingest._MAINT_LOCK}")


def test_batch_heal_is_locked_and_releases(spark, tmp_path):
    """Batch-side recover_base heals under the maintenance lock (r7 ADVICE:
    the old check-then-act let a batch heal an op's in-flight dirs) and
    releases it afterwards; steady-state calls return zero counts without
    ever creating the lock."""
    base = str(tmp_path / "corpus")
    lock = f"{base}/{ingest._MAINT_LOCK}"
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    _write_purge_tmp(spark, base, 0, [1])

    got = ingest.recover_base(spark, base)
    assert got["docs"] == 1
    assert not os.path.exists(lock)  # released after the locked heal
    _no_hidden_dirs(base)

    steady = ingest.recover_base(spark, base)
    assert steady and all(v == 0 for v in steady.values())
    assert not os.path.exists(lock)


def test_batch_recover_loses_acquire_race(spark, tmp_path, monkeypatch):
    """If a maintenance op wins the lock between recover_base's lock-free
    scan and its acquire (the r7-ADVICE TOCTOU window), the batch must
    back off: return {} and touch nothing — the in-flight dirs now belong
    to the op. Simulated by forcing createNewFile to lose."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    part, tmp = _write_purge_tmp(spark, base, 0, [1])

    real_fs_path = ingest.sinks._fs_path

    class _LosesTheRace:
        def __init__(self, fs):
            self._fs = fs

        def createNewFile(self, p):  # noqa: N802 — Hadoop API name
            return False  # someone else created the lock first

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(spark_, path):
        fs, p = real_fs_path(spark_, path)
        return _LosesTheRace(fs), p

    monkeypatch.setattr(ingest.sinks, "_fs_path", patched)
    assert ingest.recover_base(spark, base) == {}
    monkeypatch.undo()
    assert os.path.isdir(tmp)  # in-flight protocol state untouched
    assert _ids(spark, base) == [1, 2]


def test_lock_release_failure_warns_not_masks(spark, tmp_path, monkeypatch):
    """A failed lock delete in the finally path must not replace the op's
    result (r7 ADVICE: _must_delete raising in finally masked the real
    outcome): the op returns normally, a RuntimeWarning points at
    steal_lock, and the lock lingers for the next caller to steal."""
    import pytest

    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])

    real = ingest._must_delete

    def flaky(spark_, fs, path):
        if path.endswith(ingest._MAINT_LOCK):
            raise IOError(f"fs.delete returned false: {path}")
        return real(spark_, fs, path)

    monkeypatch.setattr(ingest, "_must_delete", flaky)
    with pytest.warns(RuntimeWarning, match="steal_lock"):
        out = ingest.purge_ids(spark, base, [1])
    monkeypatch.undo()
    assert out == {"docs": 1, "bands": 1}
    assert os.path.exists(f"{base}/{ingest._MAINT_LOCK}")  # lingers, documented
    assert _ids(spark, base) == [2]

    # the next maintenance entry must steal, then everything is normal again
    with pytest.raises(ingest.MaintenanceLockHeld):
        ingest.purge_ids(spark, base, [2])
    assert ingest.purge_ids(spark, base, [2], steal_lock=True) == {
        "docs": 1,
        "bands": 1,
    }
    assert not os.path.exists(f"{base}/{ingest._MAINT_LOCK}")


def test_own_orphan_lock_stolen_and_healed(spark, tmp_path):
    """r14 ADVICE (high): a lock stamped with the stream's OWN run token
    is an orphan from a crashed prior incarnation (fold/heal runs
    synchronously in-batch, so no live hold by the same stream can exist
    when a new batch starts). recover_base(own_token=...) must steal it
    and heal — otherwise the orphan suppresses healing forever while the
    trash-parked epochs stay invisible to every scan."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    _write_purge_tmp(spark, base, 0, [1])
    lock = f"{base}/{ingest._MAINT_LOCK}"
    with open(lock, "w") as f:
        f.write("tok-mine")

    # wrong token: hands off (a FOREIGN stream/op may be alive)
    assert ingest.recover_base(spark, base, own_token="tok-other") == {}
    assert os.path.exists(lock)
    # unstamped (operator) lock: never auto-stolen
    open(lock, "w").close()
    assert ingest.recover_base(spark, base, own_token="tok-mine") == {}
    assert os.path.exists(lock)

    # own token: steal, heal, release
    with open(lock, "w") as f:
        f.write("tok-mine")
    import pytest as _pytest

    with _pytest.warns(RuntimeWarning, match="stealing own orphaned"):
        got = ingest.recover_base(spark, base, own_token="tok-mine")
    assert got["docs"] == 1
    assert not os.path.exists(lock)
    _no_hidden_dirs(base)
    assert _ids(spark, base) == [1, 2]  # stale tmp dropped, no data loss


def test_own_token_steady_state_takes_no_lock(spark, tmp_path):
    """own_token must not change the steady-state contract: no leftovers,
    no lock present -> zero counts, no lock ever created."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    got = ingest.recover_base(spark, base, own_token="tok-mine")
    assert got and all(v == 0 for v in got.values())
    assert not os.path.exists(f"{base}/{ingest._MAINT_LOCK}")


def test_operator_maintenance_lock_is_unstamped(spark, tmp_path):
    """Operator-driven purge/compact must leave the lock UNSTAMPED while
    held (owner=None), so no stream can ever steal a live operator hold;
    the in-loop cadence fold stamps its run token (owner=...)."""
    base = str(tmp_path / "corpus")
    _build_base(spark, base, [[(1, LONG_A), (2, LONG_B)]])
    lock = f"{base}/{ingest._MAINT_LOCK}"

    fs, got_lock = ingest._acquire_maintenance_lock(spark, base, steal=False)
    assert ingest._read_lock_owner(spark, lock) == ""
    ingest._release_maintenance_lock(spark, fs, got_lock)

    fs, got_lock = ingest._acquire_maintenance_lock(
        spark, base, steal=False, owner="tok-a"
    )
    assert ingest._read_lock_owner(spark, lock) == "tok-a"
    ingest._release_maintenance_lock(spark, fs, got_lock)
