"""REAL audio codec, pure stdlib + numpy: a RIFF/WAVE PCM encoder and
decoder (chunk walk, ``fmt `` validation, 16-bit little-endian PCM)
plus an Arrow-batched Spark featurizer producing EXACT integer audio
statistics (sum of squares for RMS, zero crossings, peak) so a DuckDB
oracle can replay them from the synthesis formula — the audio leg of
the multimodal surface, closing the last env-stubbed media branch of
``operators/multimodal.py`` alongside the JPEG/GIF codecs in
``operators/imagecodec.py``.

PCM is lossless by construction, so decode(encode(x)) == x sample-
for-sample; there is no tolerance anywhere in this module.

Scale notes: the decode + featurize stage is ``mapInPandas`` over the
binary column — one Python worker per task, no shuffle; peak memory
is one Arrow batch of payloads. Audio features are O(samples) numpy
reductions in int64.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Canonical RIFF/WAVE container around 16-bit little-endian PCM:
    ``RIFF`` size header, ``fmt `` chunk (PCM format tag 1, channel
    count, rate, byte rate, block align, 16 bits/sample), ``data``
    chunk. ``samples`` is int16, shape (n,) for mono or (n, channels)
    interleaved row-major for multichannel."""
    samples = np.asarray(samples, dtype="<i2")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if samples.ndim == 1 and channels != 1:
        raise ValueError("multichannel audio needs (n, channels) samples")
    if samples.ndim == 2 and samples.shape[1] != channels:
        raise ValueError(
            f"samples have {samples.shape[1]} channels, header says {channels}"
        )
    if sample_rate < 1:
        raise ValueError("sample_rate must be >= 1")
    pcm = samples.tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) % 2:
        body += b"\x00"  # RIFF word-alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """REAL RIFF/WAVE decode, pure stdlib: verify the RIFF/WAVE
    signature and declared size, walk the chunk list (skipping
    unknown chunks like LIST/INFO by their length, honoring the RIFF
    word-alignment pad), validate ``fmt `` (PCM tag 1, 16-bit —
    compressed/float formats raise, like an unsupported codec), and
    return ``{"sample_rate", "channels", "n_frames", "samples"}``
    with ``samples`` int16 of shape (n_frames, channels)."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("RIFF size overruns the payload (truncated?)")
    i = 12
    fmt = None
    pcm = None
    end = 8 + riff_size
    while i + 8 <= end:
        cid = data[i : i + 4]
        (clen,) = struct.unpack("<I", data[i + 4 : i + 8])
        if i + 8 + clen > end:
            raise ValueError(f"WAV chunk {cid!r} overruns the container")
        body = data[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, byte_rate, block_align, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (16-bit only)")
    if channels < 1 or block_align != 2 * channels:
        raise ValueError("inconsistent WAV channel/block-align fields")
    if byte_rate != rate * block_align:
        raise ValueError("inconsistent WAV byte-rate field")
    if len(pcm) % block_align:
        raise ValueError("WAV data chunk is not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_frames": samples.shape[0],
        "samples": samples,
    }


AUDIO_STATS_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, n_frames int, "
    "sum_sq bigint, zero_crossings int, peak int"
)


def wav_audio_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode a WAV binary column and emit EXACT integer audio
    features per row via Arrow-batched ``mapInPandas`` (shuffle-free):
    ``sum_sq`` (the RMS numerator, int64 — exact, so oracles replay
    it), ``zero_crossings`` (strict sign changes s_i·s_{i+1} < 0 on
    channel 0), and ``peak`` (max |s|). A real feature extractor adds
    spectral stats on top; the decode/batch/schema plumbing is
    identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                d = decode_wav(bytes(payload))
                s = d["samples"].astype(np.int64)
                ch0 = s[:, 0]
                rows.append(
                    (
                        doc_id,
                        d["sample_rate"],
                        d["channels"],
                        d["n_frames"],
                        int((s * s).sum()),
                        int(((ch0[:-1] * ch0[1:]) < 0).sum()),
                        int(np.abs(s).max(initial=0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "channels",
                    "n_frames",
                    "sum_sq",
                    "zero_crossings",
                    "peak",
                ],
            )

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=AUDIO_STATS_SCHEMA)
