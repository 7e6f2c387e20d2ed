"""SparkSession factory with scale-oriented defaults.

The reference runs eager pandas on one machine (no session concept).
Here a single SparkSession owns the whole DAG; these configs are the
ones that matter at 100 TB (AQE, skew-join splitting, Arrow transfer)
but are equally valid on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "webdq",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Parameters
    ----------
    master: e.g. "local[8]"; default local[`SPARK_GRAFT_CPUS` or *].
    shuffle_partitions: defaults to the local core count — on a real
        cluster you would size this to ~2-3× total executor cores and
        let AQE coalesce.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting. At 10^12 docs the
        # host distribution of a web corpus is heavy-tailed; AQE splits the
        # skewed post-shuffle partitions that salting doesn't pre-empt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas UDF / toPandas hop (scorers.py).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep parquet scan partitions big enough to amortize task startup.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("WEBDQ_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
