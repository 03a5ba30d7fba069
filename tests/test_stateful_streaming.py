"""applyInPandasWithState session tracking: state must survive across
micro-batches (file source, maxFilesPerTrigger=1 → one batch per file)
and closed sessions must match a batch window oracle."""

import os

from pyspark.sql import functions as F

from osm_export_tool_python_spark.streaming.stateful import sessionize_stream


def test_sessionize_stream_matches_batch_oracle(spark, tmp_path):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 40)
        .select("user_id", "ts", "value", "event_id")
    )
    in_dir = str(tmp_path / "in")
    # two files → two micro-batches, split by time so state must carry over
    median_ts = ev.approxQuantile("ts", [0.5], 0.01)[0] if False else None
    ev.orderBy("ts").limit(ev.count() // 2).drop("event_id").write.mode(
        "overwrite"
    ).parquet(in_dir)
    first_cnt = spark.read.parquet(in_dir).count()
    cutoff = (
        ev.orderBy("ts").limit(first_cnt).agg(F.max("ts").alias("m")).first()["m"]
    )
    ev.where(F.col("ts") > cutoff).drop("event_id").write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(in_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)

    # batch oracle: CLOSED sessions = sessions followed by another session
    w = "PARTITION BY user_id ORDER BY ts, value"
    oracle = spark.sql(
        """
        WITH e AS (
          SELECT user_id, unix_timestamp(CAST(ts AS timestamp)) AS ep, value
          FROM parquet.`{path}`
        ), marked AS (
          SELECT *, CASE WHEN ep - LAG(ep) OVER (PARTITION BY user_id ORDER BY ep) > 1800
                         OR LAG(ep) OVER (PARTITION BY user_id ORDER BY ep) IS NULL
                    THEN 1 ELSE 0 END AS s
          FROM e
        ), sess AS (
          SELECT user_id, SUM(s) OVER (PARTITION BY user_id ORDER BY ep) AS sid, value
          FROM marked
        ), agg AS (
          SELECT user_id, sid, COUNT(*) AS n, SUM(value) AS total,
                 MAX(sid) OVER (PARTITION BY user_id) AS max_sid
          FROM sess GROUP BY user_id, sid
        )
        SELECT user_id, n, total FROM (SELECT DISTINCT user_id, sid, n, total, max_sid FROM agg)
        WHERE sid < max_sid
        """.format(path=in_dir)
    )
    got_set = {
        (r["user_id"], r["session_events"], round(r["session_value"], 6))
        for r in got.collect()
    }
    oracle_set = {
        (r["user_id"], r["n"], round(r["total"], 6)) for r in oracle.collect()
    }
    assert got_set == oracle_set
    assert got_set, "expected at least one closed session"
