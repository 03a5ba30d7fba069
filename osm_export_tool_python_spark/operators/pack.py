"""Sequence packing — the training-batch assembly operator: assign
variable-length documents to fixed token-budget bins ("pack the
context window").  Beyond the hotosm reference's scope; part of the
large-scale training-data operator family (brief requirement), like
dedup/ANN/as-of.

Two variants, both deterministic and shard-parallel:

  seq_pack         — STREAMING packing: documents are laid end-to-end
                     in doc_id order and the budget grid is cut across
                     the stream (bin = prefix_tokens // budget).  Docs
                     are never split; a bin may overflow by at most
                     one document.  Pure Column window math — no
                     Python, exactly one shuffle (the per-shard
                     window) — and closed-form SQL-replicable, so the
                     driver gate hash-checks every assignment.
  seq_pack_greedy  — STRICT-budget greedy: running total resets to a
                     new bin whenever adding the next doc would exceed
                     the budget (an over-budget doc sits alone in its
                     own bin).  Inherently sequential per shard ⇒ one
                     applyInPandas scan per shard; the shards are the
                     parallelism unit.  Oracled via DuckDB WITH
                     RECURSIVE (driver gate).

Scale shape: `shard = doc_id % n_shards` (deterministic, engine-
agnostic) bounds every window/group to 1/n_shards of the data — at
10^12 docs pick n_shards ≈ cluster cores so each shard is a single
in-memory scan; packing quality is unaffected because bins never span
shards by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def _with_shard_tokens(docs: DataFrame, id_col, text_col, n_shards):
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )


def seq_pack(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 4,
) -> DataFrame:
    """(doc_id, shard, n_tokens, bin) — streaming packing, pure Column."""
    d = _with_shard_tokens(docs, id_col, text_col, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn("bin", F.floor(prefix / budget).cast("long"))


def seq_pack_greedy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 4,
) -> DataFrame:
    """(doc_id, shard, n_tokens, bin) — strict-budget greedy packing.
    One sequential scan per shard (applyInPandas); bins never exceed
    the budget unless a single document alone does."""
    d = _with_shard_tokens(docs, id_col, text_col, n_shards)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # EXACTLY the oracle's recurrence (SQL_DOC_SEQ_PACK_GREEDY):
        # first doc opens bin 0; afterwards overflow ⇔ acc + t > budget
        # — no acc>0 guard, so a zero-token doc ahead of an over-budget
        # doc still leaves the big doc alone in its own bin
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_id, acc = 0, None
        for t in pdf["n_tokens"]:
            if acc is None:
                acc = t
            elif acc + t > budget:
                bin_id += 1
                acc = t
            else:
                acc += t
            bins.append(bin_id)
        pdf["bin"] = bins
        return pdf

    return d.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, shard long, n_tokens long, bin long"
    )


def pack_stats(packed: DataFrame, budget: int = 256) -> DataFrame:
    """Per-bin fill statistics: (shard, bin, n_docs, total_tokens,
    fill_ratio) — the packing-efficiency report a data pipeline logs."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("total_tokens") / budget, 6))
    )
