"""AQE skew-join evidence: SCALING.md claims residual hot-key imbalance
is handled by adaptive skew splitting — prove the mechanism fires.

A 98%-hot key joined without broadcast forces one giant shuffle
partition; with the skew thresholds scaled down to fixture size, AQE
must split it (SortMergeJoin(skew=true) + AQEShuffleRead skewed) and
still produce exactly the right rows. At 100 TB the same mechanism
fires at default thresholds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


def test_aqe_splits_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)

        left = spark.range(60_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()  # executes THIS plan so the final AQE plan is readable
        plan = j._jdf.queryExecution().executedPlan().toString()

        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
        # right side is unique per key -> every left row joins exactly once
        assert len(rows) == 60_000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
