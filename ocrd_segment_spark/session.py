"""Session factory with the engine's scale-aware defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Engine tuning that must hold on ANY session (local test or cluster
# submit). arrow.maxRecordsPerBatch is load-bearing: html blobs are
# tens of KB each, so the 10000-row default would make each Arrow
# batch hundreds of MB per Python worker — the exact OOM mode the
# 512-row bound exists to prevent.
def _tuning(arrow_batch: int = 512) -> dict[str, str]:
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch),
    }


def submit_session(app: str, arrow_batch: int = 512, extra: dict | None = None) -> SparkSession:
    """Session for spark-submit entrypoints: applies the engine tuning
    but leaves master, executor sizing, and driver memory to the
    submit command / cluster manager. shuffle.partitions is also left
    to the cluster default (AQE coalesces at runtime) unless the
    submitter set one."""
    builder = SparkSession.builder.appName(app)
    for k, v in _tuning(arrow_batch).items():
        builder = builder.config(k, v)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def build_session(
    app: str = "ocrd_segment_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 512,
    extra: dict | None = None,
) -> SparkSession:
    """Defaults chosen for the 100 TB design point, scaled to sandbox:

    - AQE on (runtime coalesce + skew-join split);
    - Arrow enabled; ``maxRecordsPerBatch`` bounded because html blobs
      are tens-of-KB each — 512 rows ≈ tens of MB per batch, keeping
      Python worker memory flat regardless of executor count;
    - shuffle partitions sized to cores in local mode (a real cluster
      would size to ~2-3× total cores and let AQE coalesce).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[32]")
    cores = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _tuning(arrow_batch).items():
        builder = builder.config(k, v)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
