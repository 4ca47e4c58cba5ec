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


# ---------------------------------------------------------------------------
# perceptual near-dup over binary payloads (dHash-style fingerprint +
# banded-Hamming blocking)
# ---------------------------------------------------------------------------

#: fingerprint width — 60 bits so the value always fits a signed BIGINT
#: in every engine (the repo-wide md5_long convention)
PHASH_BITS = 60


def _phash_one(buf: bytes, bits: int) -> int:
    """dHash of one payload: split the byte stream into ``bits + 1``
    equal-ish blocks (boundaries at floor(j·n/(bits+1)) — the exact
    rule the SQL oracle replays), take each block's exact integer
    intensity (byte-value sum), and set bit j iff intensity_j >
    intensity_{j+1}. The gradient-sign construction is what makes the
    hash PERCEPTUAL: a localized edit perturbs a few block sums, so
    near-identical payloads land within a small Hamming distance,
    while the per-block comparison is invariant to global brightness/
    length shifts that move all sums together."""
    import numpy as np

    n = len(buf)
    if n == 0:
        return 0
    blocks = bits + 1
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(a)))
    bounds = (np.arange(blocks + 1, dtype=np.int64) * n) // blocks
    inten = cs[bounds[1:]] - cs[bounds[:-1]]
    bits_set = (inten[:-1] > inten[1:]).astype(np.uint64)
    return int((bits_set << np.arange(bits, dtype=np.uint64)).sum())


def perceptual_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bits: int = PHASH_BITS,
) -> DataFrame:
    """(id, phash, n_bytes) perceptual fingerprints over a binary
    payload column via Arrow-batched ``mapInPandas`` — the content-
    level multimodal operator (a real deployment swaps the byte-sum
    "intensity" for decoded pixel intensities; the block/gradient/
    bit-pack plumbing is identical and is what's verified here).
    Intra-row and shuffle-free: fingerprints for a billion payloads
    cost one scan; only the downstream band join shuffles. Exact
    integer arithmetic end-to-end, so the DuckDB oracle replays the
    hash bit-for-bit from the payload hex (the q113 device)."""
    import numpy as np  # noqa: F401  (imported for the worker closure)

    out_schema = f"{id_col} bigint, phash bigint, n_bytes bigint"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": [_phash_one(bytes(p), bits) for p in payloads],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=out_schema)


def phash_band_rows(
    fps: DataFrame,
    bands: int = 4,
    bits: int = PHASH_BITS,
    id_col: str = "doc_id",
    fp_col: str = "phash",
) -> DataFrame:
    """(id, band, sig) rows: the fingerprint split into ``bands``
    disjoint bit-slices — the LSH-shaped key that turns Hamming-ball
    search into equi-joins (Manku et al., "Detecting Near-Duplicates
    for Web Crawling"). Same row shape as the MinHash band store, so
    the banded join reuses the skew-guarded LSH pair machinery."""
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    vals = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"j -> pmod(shiftright({fp_col}, j * {width}), {1 << width}))"
    )
    return fps.select(F.col(id_col), F.posexplode(vals).alias("band", "sig"))


def phash_near_dup_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = PHASH_BITS,
    id_col: str = "doc_id",
    fp_col: str = "phash",
    max_group: int = 1024,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming) among perceptual
    fingerprints with Hamming distance ≤ ``max_hamming``, found by
    banded blocking — NEVER all-pairs. Pigeonhole completeness: with
    ``max_hamming < bands``, two fingerprints within the Hamming
    bound differ in fewer bands than exist, so at least one band
    slice matches exactly and the equi-join cannot miss a true pair.
    Candidate generation is the skew-guarded LSH bucket expansion
    (``incremental_lsh_pairs`` — per-task pair fan-out bounded by
    ``max_group``² even if a degenerate fingerprint floods a bucket),
    then one exact ``bit_count(xor)`` filter. At 100 TB: one shuffle
    on (band, sig), candidates ~ corpus/2^(bits/bands) per band plus
    true near-dups, nothing quadratic."""
    from owl_etl_spark.operators.dedup import incremental_lsh_pairs

    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for "
            f"complete candidate generation (got {bands})"
        )
    rows = phash_band_rows(fps, bands, bits, id_col, fp_col)
    cand = incremental_lsh_pairs(rows, None, id_col=id_col, max_group=max_group)
    fa = fps.select(F.col(id_col).alias("id_a"), F.col(fp_col).alias("__fa"))
    fb = fps.select(F.col(id_col).alias("id_b"), F.col(fp_col).alias("__fb"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", F.expr("bit_count(__fa ^ __fb)").cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
