"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster — AQE owns runtime re-planning
(partition coalescing, skew-join splitting), and shuffle partitions
are sized from the environment rather than hardcoded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "owl-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Notable settings:
    - ``spark.sql.adaptive.*``: AQE re-plans at runtime — coalesces
      small shuffle partitions and splits skewed ones, which is the
      first line of defense against key skew at 100 TB.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp
      semantics (and parity with the DuckDB oracle, which is
      UTC-naive).
    - ``spark.sql.legacy.parquet.nanosAsLong=true``: the synthetic
      ``events`` table stores TIMESTAMP(NANOS) which Spark's vectorized
      parquet reader otherwise rejects; we read nanos as long and
      convert explicitly (see ``sources.readers.read_events``).
    - Arrow enabled: every Pandas UDF / mapInPandas boundary is
      Arrow-batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def spread_for_cpu(df, by=None):
    """Repartition a CPU-dense narrow stage's input so per-row work
    (normalize/tokenize/hash chains) runs wide, with an EXPLICIT
    partition count AQE cannot coalesce away (guide §2.4: adaptive
    coalescing targets shuffle BYTES, so a small-bytes/heavy-CPU map
    stage gets folded onto one task exactly when parallelism matters
    most — measured on q85: a 2s single-task text stage vs 32-way).

    Scale-adaptive, not local-tuned: the target is
    max(spark.sql.shuffle.partitions, current scan partitions) — on a
    petabyte table the scan already carries more partitions than the
    target and this is a NO-OP (no exchange is added); on a small or
    single-file input it spreads to the environment-derived width.
    Pass ``by`` (a column) to keep a downstream groupBy on that column
    exchange-free."""
    spark = df.sparkSession
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        target = spark.sparkContext.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target, by) if by is not None else df.repartition(target)
