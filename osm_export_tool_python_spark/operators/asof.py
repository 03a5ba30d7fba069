"""As-of (nearest-earlier) join — the canonical training-data log
alignment operator (brief: custom operators Spark lacks, expressed as
a composition of built-in DataFrame ops).

A naive as-of is a range join (`l.ts >= r.ts` + greatest per pair),
which Catalyst executes as a per-key cross product — quadratic on hot
keys.  This implementation is the scalable union+window form:

  1. tag both sides and unionByName them (right payload columns become
     NULL on left rows and vice versa — allowMissingColumns),
  2. ONE shuffle: window partitioned by the key, ordered by
     (ts, side) with right rows sorting before left rows at equal ts
     (inclusive semantics: a right row AT the left timestamp matches),
  3. running `last(payload, ignorenulls=True)` propagates the most
     recent right payload onto every subsequent row,
  4. keep the left rows.

Cost: one hash shuffle + one in-partition sort — the same price as the
sessionize window, no join explosion, AQE skew-split applies.  All
payload columns share one Window frame, so Catalyst emits a single
Window operator.
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
    right_cols=None,
    suffix: str = "_r",
) -> DataFrame:
    """Each left row gains the payload of the LATEST right row with
    ``right_ts <= left_ts`` for the same ``on`` key (NULLs when no
    earlier right row exists).

    ``right_cols`` — payload columns to carry over (default: everything
    except the key and timestamp), each renamed with ``suffix``.
    Ties among right rows at the same (key, ts) resolve by the window's
    in-partition order; pass pre-deduplicated rights for deterministic
    payloads at duplicate timestamps."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    ).withColumn("__side", F.lit(0))

    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(c + suffix, F.last(c + suffix, ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__ts", "__side")
