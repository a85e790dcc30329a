"""Streaming data-quality gate: check_expectations evaluated per
micro-batch inside foreachBatch — good batches land in the table, bad
batches divert to a quarantine directory with their violation report.
The batch operator composes into streaming unchanged (one aggregation
per micro-batch)."""
from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from valkey_search_spark.operators.expectations import (Expect,
                                                        check_expectations)


def test_streaming_expectation_gate(spark, tmp_path):
    src = tmp_path / "src"
    good_dir = str(tmp_path / "good")
    quar_dir = str(tmp_path / "quarantine")
    os.makedirs(str(src))

    schema = "doc_id long, text string"
    clean = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], schema)
    dirty = spark.createDataFrame(
        [(100 + i, None if i % 2 else f"doc {i}") for i in range(20)]
        + [(100, "dup-key")], schema)
    clean.write.mode("append").parquet(str(src))

    checks = [Expect("null_fraction", "text", max_null_fraction=0.1),
              Expect("unique", "doc_id")]
    reports = []

    def gate(batch_df, batch_id):
        batch_df = batch_df.cache()
        try:
            res = check_expectations(batch_df, checks).collect()
            ok = all(r["passed"] for r in res)
            reports.append((batch_id, ok,
                            {r["name"]: r["observed"] for r in res}))
            target = good_dir if ok else quar_dir
            batch_df.write.mode("append").parquet(target)
            if not ok:
                os.makedirs(str(tmp_path / "reports"), exist_ok=True)
                with open(str(tmp_path / "reports"
                              / f"violations_{batch_id}.json"),
                          "w") as f:
                    json.dump([r.asDict() for r in res if not r["passed"]],
                              f, default=str)
        finally:
            batch_df.unpersist()

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (stream.writeStream.foreachBatch(gate)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # second batch: dirty
    dirty.write.mode("append").parquet(str(src))
    q = (stream.writeStream.foreachBatch(gate)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    good = spark.read.parquet(good_dir)
    assert good.count() == 50                      # only the clean batch
    quarantined = spark.read.parquet(quar_dir)
    assert quarantined.count() == 21
    rep_dir = str(tmp_path / "reports")
    viol = [f for f in os.listdir(rep_dir) if f.startswith("violations")]
    assert len(viol) == 1
    with open(os.path.join(rep_dir, viol[0])) as f:
        failed = {v["name"] for v in json.load(f)}
    assert failed == {"null_fraction(text)", "unique(doc_id)"}
    assert [ok for _, ok, _ in sorted(reports)] == [True, False]
