"""SparkSession factory with scale-oriented defaults.

The reference pipeline is a single-process Rust binary (see
/root/reference/src/main.rs:19-20); the engine's equivalent of its "tuning"
(batch-size tiers, main.rs:243-251) is Spark configuration: AQE for runtime
partition coalescing / skew-join splitting, Arrow for vectorized Python
interop, and an explicit shuffle-partition count sized to the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) in
    the sandbox; on a real cluster you'd omit it and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # this is what turns a static plan into one that survives skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: vectorized pandas-UDF transfer (no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamps across the DuckDB oracle boundary.
        .config("spark.sql.session.timeZone", "UTC")
        # Web bytes are dirty: decode() malformed input substitutes U+FFFD
        # instead of failing the scan (functions/charset.py UTF-16 paths;
        # the UTF-8 path is conf-free via make_valid_utf8).
        .config("spark.sql.legacy.codingErrorAction", "true")
        # INT96 (Spark's legacy default) carries NO parquet min/max stats,
        # which silently disables the lake's per-file timestamp range
        # pruning (stats_cols) AND row-group skipping on event time.
        # TIMESTAMP_MICROS is the modern format with full statistics.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Shuffle/spill scratch space. On a cluster this is per-executor local
    # SSD; in the sandbox a tmpfs (SPARK_GRAFT_LOCAL_DIR=/dev/shm/...) keeps
    # a single shared spinning disk from serializing all executor threads.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
