"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/featurized through Arrow-batched ``mapInPandas``.

Real pipelines carry images/audio/video as ``binary`` columns next to
typed metadata, and run decode → feature-extract → resize/frame-sample
as vectorized UDF stages. The image/audio codecs are not available in
this environment, so ``_decode`` is a clearly-marked deterministic
stub — the Spark-side contract (schema, batching, partitioning, UDF
signature) is real and tested, and swapping the stub for PIL/ffmpeg is
a one-function change.

Scale notes: ``mapInPandas`` streams Arrow batches, so peak memory is
one batch of payloads per task — size ``spark.sql.execution.arrow.
maxRecordsPerBatch`` to keep batch_bytes × task_threads inside executor
memory when payloads are MBs (images), and repartition upstream so
tasks are payload-balanced rather than row-balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor — fixed and explicit so the
#: pipeline's downstream schema never depends on UDF internals.
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, feature_norm double"
)


def to_binary_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    media_type: F.Column | None = None,
) -> DataFrame:
    """Wrap a source column as an opaque binary payload with typed
    metadata — the canonical multimodal row shape:
    (id, payload binary, media_type string, n_bytes long).
    ``media_type`` may be a Column for mixed-media corpora (drives the
    per-type decoder dispatch in ``extract_features``)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (media_type if media_type is not None else F.lit("text/plain")).alias("media_type"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def _decode(payload: bytes, media_type: str) -> dict:
    """STUB decode. A real deployment replaces this with PIL/ffmpeg/
    soundfile decoding. Here: deterministic pseudo-dimensions derived
    from the payload so tests have stable expectations.

    Raises ``NotImplementedError`` for media types the stub does not
    model, mirroring how a production decoder should fail loudly on
    unsupported codecs. The two supported types decode with DIFFERENT
    (deterministic) dimension formulas so per-type dispatch is
    observable end-to-end — an oracle over mixed-media input catches a
    decoder that ignores ``media_type``.
    """
    n = len(payload)
    if media_type == "text/plain":
        return {"width": (n % 640) + 1, "height": (n % 480) + 1, "feature_norm": float(n % 1000) / 1000.0}
    if media_type == "image/fake":
        return {"width": (n % 1280) + 1, "height": (n % 720) + 1, "feature_norm": float(n % 997) / 997.0}
    raise NotImplementedError(f"no decoder for {media_type}")


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches).

    One python worker per task; each yielded batch is columnar. The
    UDF touches only the columns it needs — keep payload last in
    upstream projections so column pruning can drop it afterwards.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feature_norm": [f["feature_norm"] for f in feats],
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)
