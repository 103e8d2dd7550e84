"""as-of join semantics: latest right row with right_ts <= left_ts per key,
inclusive at equal timestamps, null when no prior right row."""

from __future__ import annotations

import datetime

from healthcare_rcm_etl_pipeline_spark.operators.asof import asof_join

TS = lambda s: datetime.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, TS("2024-01-01T10:00:00"), "p1"),  # after r at 09:00 -> matches r2
            (1, TS("2024-01-01T08:00:00"), "p2"),  # before any right -> null
            (1, TS("2024-01-01T09:00:00"), "p3"),  # exactly at r2 -> inclusive match
            (2, TS("2024-01-01T12:00:00"), "p4"),  # other key -> r3
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, TS("2024-01-01T08:30:00"), "r1"),
            (1, TS("2024-01-01T09:00:00"), "r2"),
            (2, TS("2024-01-01T11:00:00"), "r3"),
        ],
        "user_id int, ts timestamp, rtag string",
    )
    out = {
        r["tag"]: (r["rtag_right"], r["ts_right"])
        for r in asof_join(left, right, on="user_id", right_cols=["rtag"]).collect()
    }
    assert out["p1"] == ("r2", TS("2024-01-01T09:00:00"))
    assert out["p2"] == (None, None)
    assert out["p3"] == ("r2", TS("2024-01-01T09:00:00"))
    assert out["p4"] == ("r3", TS("2024-01-01T11:00:00"))
