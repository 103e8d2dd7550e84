"""Surrogate-key determinism (SURVEY.md §2h): dense, 0-based, stable under
partitioning; the scalable variant must equal the global-sort rank."""

from __future__ import annotations

from healthcare_rcm_etl_pipeline_spark.operators.keys import dense_sk, dense_sk_scalable


def test_dense_sk_dedups_and_orders(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), ("c",)], ["k"])
    out = {r["k"]: r["sk"] for r in dense_sk(df, ["k"]).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_dense_sk_scalable_equals_sort_rank(spark):
    data = [(i * 7919 % 1000,) for i in range(1000)]  # shuffled unique keys
    df = spark.createDataFrame(data, ["k"]).repartition(13)
    out = dense_sk_scalable(df, ["k"], sk_col="sk", num_partitions=7)
    rows = sorted((r["k"], r["sk"]) for r in out.collect())
    assert rows == [(k, k) for k in range(1000)]


def test_dense_sk_scalable_start_offset(spark):
    df = spark.createDataFrame([(10,), (20,), (30,)], ["k"])
    out = sorted(r["sk"] for r in dense_sk_scalable(df, ["k"], start=100).collect())
    assert out == [100, 101, 102]


def test_dense_sk_scalable_checkpoint_mode_stable_ids(spark, tmp_path):
    """materialize='checkpoint' truncates lineage at the ranked relation:
    ids must be identical across repeated actions (re-execution cannot
    re-sample range boundaries) and no cache registration happens."""
    from healthcare_rcm_etl_pipeline_spark.operators import keys as K

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    data = [(i * 7919 % 1000,) for i in range(1000)]
    df = spark.createDataFrame(data, ["k"]).repartition(13)
    before = len(K._SK_CACHES)
    out = dense_sk_scalable(df, ["k"], num_partitions=7, materialize="checkpoint")
    assert len(K._SK_CACHES) == before  # checkpoint mode registers nothing
    first = sorted((r["k"], r["sk"]) for r in out.collect())
    second = sorted((r["k"], r["sk"]) for r in out.collect())  # re-execution
    assert first == second == [(k, k) for k in range(1000)]


def test_release_sk_caches_unpersists(spark):
    from healthcare_rcm_etl_pipeline_spark.operators import keys as K

    df = spark.createDataFrame([(3,), (1,), (2,)], ["k"])
    out = dense_sk_scalable(df, ["k"])
    assert sorted(r["sk"] for r in out.collect()) == [0, 1, 2]
    assert K._SK_CACHES
    K.release_sk_caches()
    assert not K._SK_CACHES


def test_stable_sk_first_run_is_dense(spark):
    from healthcare_rcm_etl_pipeline_spark.operators.keys import stable_sk

    df = spark.createDataFrame([("b", 1), ("a", 2), ("b", 3)], ["k", "v"])
    out = {(r["k"], r["v"]): r["sk"] for r in stable_sk(df, ["k"], "sk").collect()}
    # dense over distinct keys, all rows of a key share the sk
    assert out == {("a", 2): 0, ("b", 1): 1, ("b", 3): 1}


def test_stable_sk_keeps_old_keys_appends_new(spark):
    from healthcare_rcm_etl_pipeline_spark.operators.keys import stable_sk

    existing = spark.createDataFrame(
        [("a", 0), ("m", 1), ("z", 2)], ["k", "sk"]
    )
    # new batch drops 'm', keeps a/z, adds two new keys that sort BEFORE z
    df = spark.createDataFrame([("a",), ("z",), ("b",), ("c",)], ["k"])
    out = {r["k"]: r["sk"] for r in stable_sk(df, ["k"], "sk", existing=existing).collect()}
    # old keys keep their sk (no positional shift), new keys append after max
    assert out == {"a": 0, "z": 2, "b": 3, "c": 4}
