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
  3. running `last(payload, ignorenulls=True)` over ONE struct packing
     all right payload columns propagates the most recent right ROW
     onto every subsequent row (per-column propagation would stitch
     fields from different right rows whenever the latest row holds a
     legitimate NULL — the struct is non-NULL exactly on right rows, so
     the whole payload always comes from the single matched row),
  4. keep the left rows and unpack the struct.

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
    if not right_cols:
        return left

    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    # a NULL right timestamp can never be "the most recent earlier row"
    # (it would sort first and leak its payload onto every left row)
    r2 = (
        right.where(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__rpay"),
        )
        .withColumn("__side", F.lit(0))
    )

    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__rpay", F.last("__rpay", ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col("__rpay")[c])
    return out.drop("__ts", "__side", "__rpay")
