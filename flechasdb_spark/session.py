"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM; on a real cluster the same configs hold except
``spark.driver.memory`` (executors get their own memory) — the
scale-relevant knobs (AQE, shuffle partitions, Arrow) are cluster-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flechasdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting —
      at 100 TB the static partition count is always wrong somewhere.
    - Arrow on: every Pandas-UDF boundary is Arrow-batched.
    - UTC session timezone: required for DuckDB-oracle comparability.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # UI off by default (driver overhead); SPARK_GRAFT_UI=1 turns it
        # on for per-job diagnosis (scripts/jobtrace_r13.py reads the
        # REST API for job names/durations)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet splits are sized on COMPRESSED bytes; our post-scan
        # stages are CPU-dense (hashing, PQ encode, norms) over text /
        # arrays that expand 5-10x in memory, so the 128 MB default
        # yields single-task scans on small corpora and ~1 GB of
        # in-memory work per task at scale. 16 MB compressed ~= 100-150
        # MB expanded — the classic task-size target — and AQE coalesces
        # away any resulting small shuffle outputs.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        # ... and never scan with fewer splits than there are cores:
        # a sub-16MB file is otherwise ONE task, serializing CPU-dense
        # stages (hashing, norms) behind a single core. At cluster
        # scale file counts dwarf this minimum, so it's a no-op there.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # first()/take(k) after a selective filter: executeTake's
        # default ramp (1 partition, then 4x per round) is a sequence
        # of BLOCKING driver round-trips — 3 sequential jobs to find
        # one matching row. Starting the first round at the core count
        # runs those probe tasks in parallel on otherwise-idle cores
        # (r12, guide §7.3 "driver round-trips"); at cluster scale the
        # same reasoning holds per executor wave, and the knob stays
        # env-tunable for deployments where a single-partition probe
        # is cheaper than a wave.
        .config(
            "spark.sql.limit.initialNumPartitions",
            os.environ.get("SPARK_GRAFT_LIMIT_INITIAL_PARTITIONS", str(cpus)),
        )
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long (ns since epoch) — ordering and
        # window semantics are unchanged, convert explicitly where a
        # timestamp type is needed (timestamp_micros(ts div 1000)).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def normalize_event_ts(df, col: str = "ts"):
    """Return ``df`` with ``col`` as BIGINT nanoseconds since epoch.

    The driver-generated events table has carried the event time as
    parquet TIMESTAMP(NANOS) in some rounds (read as long ns via the
    legacy nanosAsLong conf) and TIMESTAMP(MICROS) in others (read as
    timestamp_ntz). Every downstream operator/oracle assumes long ns,
    so normalize here: timestamps are interpreted in the session's UTC
    timezone, matching DuckDB's epoch_us(ts) on the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema[col].dataType, LongType):
        return df
    return df.withColumn(
        col, F.expr(f"unix_micros(cast({col} as timestamp)) * 1000")
    )
