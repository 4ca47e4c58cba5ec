"""Property-based laws for the media codecs (hypothesis): the
lossless codecs (GIF/LZW, WAV PCM) must round-trip EXACTLY on
arbitrary inputs; the lossy JPEG must round-trip within its
quantization bound on arbitrary images and exactly on flat blocks.
Shrinking gives minimal counterexamples if a codec edge (filter
boundary, code-width bump, byte stuffing, RIFF padding) regresses."""

import numpy as np
import pytest

# r13 test tiering (VERDICT r12 #2): this suite runs in the FULL tier
# (tools/round_close.py --full-tests); the default time-boxed tier
# excludes it so the driver's verification window completes.
pytestmark = pytest.mark.full
from hypothesis import given, settings, strategies as st

from owl_etl_spark.operators.audiocodec import decode_wav, encode_wav_pcm16
from owl_etl_spark.operators.imagecodec import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif_frames,
    decode_jpeg_pixels,
    encode_gif_frames,
    encode_jpeg_baseline,
)

COMMON = dict(max_examples=30, deadline=None)


@given(data=st.binary(min_size=0, max_size=5000))
@settings(**COMMON)
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert _lzw_decompress(_lzw_compress(data), 8, len(data)) == data


@given(
    seed=st.integers(0, 2**32 - 1),
    nf=st.integers(1, 6),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
)
@settings(**COMMON)
def test_gif_roundtrip_arbitrary_frames(seed, nf, h, w):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
    d = decode_gif_frames(encode_gif_frames(frames))
    assert d["n_frames"] == nf and d["width"] == w and d["height"] == h
    assert (d["frames"] == frames).all()


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(0, 500),
    channels=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(**COMMON)
def test_wav_roundtrip_arbitrary_pcm(seed, n, channels, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
    d = decode_wav(encode_wav_pcm16(s, rate, channels=channels))
    assert d["sample_rate"] == rate and d["channels"] == channels
    assert d["n_frames"] == n and (d["samples"] == s).all()


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    restart=st.sampled_from([0, 1, 3]),
)
@settings(**COMMON)
def test_jpeg_gray_roundtrip_within_quant_bound(seed, h, w, restart):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    d = decode_jpeg_pixels(encode_jpeg_baseline(img, restart_interval=restart))
    assert d["pixels"].shape == (h, w, 1)
    err = np.abs(d["pixels"][..., 0].astype(int) - img.astype(int)).max()
    # default tables: AC step 1 (≤0.5 per coef), DC step 8 (≤4 -> ≤0.5
    # per pixel after IDCT), plus pixel rounding — observed ≤2
    assert err <= 4


@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=9),
)
@settings(**COMMON)
def test_jpeg_flat_blocks_exact_any_values(vals):
    """Any grid of flat 8x8 blocks round-trips byte-exactly — the
    q359 oracle device, as a law over arbitrary block values."""
    n = len(vals)
    img = np.zeros((8, 8 * n), dtype=np.uint8)
    for j, v in enumerate(vals):
        img[:, 8 * j : 8 * (j + 1)] = v
    d = decode_jpeg_pixels(encode_jpeg_baseline(img))
    assert (d["pixels"][..., 0] == img).all()
