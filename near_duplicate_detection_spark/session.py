"""SparkSession construction for the engine.

Local mode is the sandbox proxy for a multi-executor cluster; the settings
below are the ones that survive a scale-up: AQE on (runtime coalesce + skew
join splitting), shuffle partitions sized to parallelism, Arrow enabled for
every pandas-UDF boundary, UTC session timezone so results compare bit-stable
against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_WAREHOUSE: str | None = None


def _warehouse_dir() -> str:
    """Unique scratch warehouse per process (memoized — getOrCreate may be
    called repeatedly but only the first session config takes effect);
    cleaned up at interpreter exit."""
    global _WAREHOUSE
    if _WAREHOUSE is None:
        env = os.environ.get("SPARK_GRAFT_WAREHOUSE")
        if env:
            _WAREHOUSE = env
        else:
            import atexit
            import shutil
            import tempfile

            _WAREHOUSE = tempfile.mkdtemp(prefix="ndd_warehouse_")
            atexit.register(shutil.rmtree, _WAREHOUSE, True)
    return _WAREHOUSE


def get_spark(
    app_name: str = "near_duplicate_detection_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[32]")
    # parallelism-derived default: ~1 shuffle partition per core locally;
    # on a real cluster this would be 2-3x total executor cores.
    if shuffle_partitions is None:
        cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # start every shuffle wide and let AQE coalesce DOWN: sizing the
        # initial partition count to the core count makes big shuffles
        # (e.g. the 300k-doc shingle-set verify join) sort-spill at low
        # core counts — partition size must track DATA, not parallelism
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        # 64 MB advisory partitions coalesce a ~1 GB join down to ~16 tasks —
        # under-using 32 cores; 16 MB keeps mid-size shuffles wide enough
        # while still coalescing away empty/tiny partitions
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(16 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = ONE JVM for driver + all 32 executor threads: heap
        # must cover 32 concurrent task buffers + broadcast builds +
        # localCheckpoint blocks. 16g starved a 400k-doc append onto a
        # 4M-doc corpus ("Not enough memory to build and broadcast"); the
        # sandbox has 128 GiB — size like a real 32-core executor group.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Input-split granularity for Arrow-UDF-heavy stages: the 128 MB
        # default assumes JVM scan-bound work and packs this engine's ~4 MB
        # bucket files into a handful of tasks — stage 1 ran 5 tasks on 32
        # cores in round 1. Python-UDF stages want ~1 task per file so the
        # signature/fingerprint compute (the dominant per-doc cost) spreads
        # over every core; on a production cluster with 128 MB row groups
        # the default ratio re-emerges naturally (one row group per task).
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # bucketed stage tables (sources/bucketed.py) need a catalog home;
        # keep it off the repo tree AND unique per process (a fixed shared
        # path would let concurrent runs overwrite each other's saveAsTable
        # dirs, and a bare-PID suffix could collide via PID recycling)
        .config("spark.sql.warehouse.dir", _warehouse_dir())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
