"""Incremental batch processing: the reference's monthly-folder-drop
operating mode as a checkpointed Structured Streaming file source with
``trigger(availableNow=True)``.

Each invocation processes exactly the files that arrived since the
last run (the checkpoint tracks seen files), runs the full FIC
transform, and appends to the silver layer — the Auto-Loader-style
"process whatever is new, then stop" contract. Re-running after a
crash is safe: the sink commit log and source checkpoint make each
file exactly-once into silver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from owl_etl_spark.schemas import FIC_RAW_SCHEMA
from owl_etl_spark.sources.readers import derive_metadata_from_filename


def incremental_silver(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    url_lookup: DataFrame | None = None,
    timeout_sec: int = 300,
) -> None:
    """Process new bronze files into silver, then stop.

    Bronze rows are the engine's staged JSONL (FIC document fields +
    ``filename``). The transform runs per micro-batch via foreachBatch
    (it contains a broadcast join, which is batch-scoped state).
    """
    from owl_etl_spark.plans.fic_pipeline import transform_fic_documents
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(FIC_RAW_SCHEMA.fields) + [StructField("filename", StringType())])
    stream = spark.readStream.schema(schema).json(bronze_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bronze = derive_metadata_from_filename(batch_df)
        silver = transform_fic_documents(bronze, url_lookup=url_lookup)
        silver.write.mode("append").json(silver_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
