"""asof_join semantics + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "l1"), (1, _ts(10), "l2"), (2, _ts(3), "l3"), (3, _ts(9), "l4")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 100), (1, _ts(10), 200), (2, _ts(7), 300)],
        "k long, ts timestamp, payload long",
    )
    got = {
        r["name"]: r["payload_r"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {
        "l1": 100,   # latest right at/before 00:05 is 00:04
        "l2": 200,   # equal timestamps match (inclusive)
        "l3": None,  # right row is later than the left row
        "l4": None,  # key has no right rows at all
    }


def test_asof_multiple_payload_columns_single_window(spark):
    left = spark.createDataFrame([(1, _ts(9))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 7, "a"), (1, _ts(8), 8, "b")],
        "k long, ts timestamp, x long, y string",
    )
    out = asof_join(left, right, on="k")
    row = out.collect()[0]
    assert (row["x_r"], row["y_r"]) == (8, "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all payload columns ride ONE struct through ONE last() in ONE
    # Window operator (AQE prints the plan twice — initial and final —
    # so count lines, not occurrences)
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert win_lines and all("last(__rpay" in l for l in win_lines)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_null_payload_and_null_ts(spark):
    """Two latent traps (ADVICE r2): a legitimately-NULL field in the
    LATEST right row must come through as NULL (not be back-filled from
    an older row — the whole payload must come from one right row), and
    a right row with NULL timestamp must never match anything."""
    left = spark.createDataFrame(
        [(1, _ts(9), "l1"), (2, _ts(9), "l2")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            # k=1: older row has x=7,y='a'; NEWER row has x=8, y=NULL
            (1, _ts(1), 7, "a"),
            (1, _ts(8), 8, None),
            # k=2: only a NULL-timestamp row — must NOT propagate
            (2, None, 9, "z"),
        ],
        "k long, ts timestamp, x long, y string",
    )
    got = {r["name"]: (r["x_r"], r["y_r"]) for r in asof_join(left, right, on="k").collect()}
    assert got["l1"] == (8, None)     # NOT (8, 'a') — no cross-row stitching
    assert got["l2"] == (None, None)  # NULL-ts right row never matches
