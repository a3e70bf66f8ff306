"""Animated-GIF codec (operators/gif.py) + real Spark frame sampling:
LZW round-trip properties, exactness on palette-aligned frames, bounded
quantization error on arbitrary RGB, container conformance, honest refusal
of unsupported variants, and the mapInPandas decode→per-frame-stats path."""

import numpy as np
import pytest

from exstream_implementation_spark.operators.gif import (
    PALETTE,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
    quantize,
)


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(1)
    for n in (1, 5, 255, 256, 1000, 20000):
        idx = rng.integers(0, 256, n).astype(np.uint8)
        rt = lzw_decode(lzw_encode(idx))
        assert len(rt) == n and (rt == idx).all(), n
    # degenerate: constant runs (dictionary growth + code-width bumps)
    idx = np.zeros(10000, dtype=np.uint8)
    assert (lzw_decode(lzw_encode(idx)) == idx).all()


def test_lzw_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(0, 255), min_size=1, max_size=600))
    def check(vals):
        idx = np.array(vals, dtype=np.uint8)
        assert (lzw_decode(lzw_encode(idx)) == idx).all()

    check()


def test_palette_covers_332_grid():
    assert PALETTE.shape == (256, 3)
    assert len({tuple(c) for c in PALETTE}) == 256
    # quantize maps each palette color to its own index (identity fixpoint)
    idx = quantize(PALETTE.reshape(1, 256, 3)).reshape(-1)
    assert (PALETTE[idx] == PALETTE).all()


def test_multiframe_roundtrip_exact_on_palette_colors():
    rng = np.random.default_rng(7)
    h, w = 11, 17
    frames = [PALETTE[rng.integers(0, 256, (h, w))] for _ in range(4)]
    payload = encode_gif(frames)
    assert payload[:6] == b"GIF89a" and payload[-1] == 0x3B
    back = decode_gif(payload)
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_arbitrary_rgb_within_quantization_step():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_gif(encode_gif([img]))[0]
    err = np.abs(dec.astype(int) - img.astype(int))
    # half a 3-3-2 level per channel: ceil(255/7/2)=19, ceil(255/3/2)=43
    assert err[..., 0].max() <= 19
    assert err[..., 1].max() <= 19
    assert err[..., 2].max() <= 43


def test_refuses_unsupported_variants():
    img = PALETTE[np.zeros((4, 4), dtype=np.int64)]
    b = bytearray(encode_gif([img]))
    # find the image descriptor (0x2C after the NETSCAPE-free single frame)
    desc = bytes(b).find(b"\x2c")
    interlaced = bytearray(b)
    interlaced[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(interlaced))
    lct = bytearray(b)
    lct[desc + 9] |= 0x80
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(lct))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 32)


def test_spark_gif_frame_sampling(spark):
    """attach real animated GIFs → decode in Arrow workers → per-frame
    stats; every value must equal a local numpy decode of the same formula
    (frame f of doc d is synth_pixels(d + f) quantized to the palette)."""
    from exstream_implementation_spark.operators.multimodal import (
        attach_gif_payload,
        sample_gif_frames,
        synth_pixels,
    )
    from exstream_implementation_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 15"
    )
    got = {
        (r["doc_id"], r["frame_idx"]): (r["width"], r["height"], r["px_mean"])
        for r in sample_gif_frames(attach_gif_payload(docs)).collect()
    }
    assert len(got) == 15 * 4
    for (did, k), (w, h, mean) in got.items():
        frame = PALETTE[quantize(synth_pixels(did + k))]
        assert (w, h) == (frame.shape[1], frame.shape[0])
        want = float(frame.astype(np.int64).sum()) / (frame.shape[0] * frame.shape[1] * 3)
        assert mean == pytest.approx(want, abs=1e-12), (did, k)


def test_lzw_min_code_size_validated_and_small_sizes_roundtrip():
    """GIF spec bounds min_code_size to [2, 8]; below 2 the encoder/decoder
    width-bump schedules desynchronize (ADVICE r08), so both ends validate.
    In-range small sizes must still round-trip."""
    rng = np.random.default_rng(3)
    for mcs in (2, 3, 4):
        idx = rng.integers(0, 1 << mcs, 500).astype(np.uint8)
        enc = lzw_encode(idx, min_code_size=mcs)
        assert (lzw_decode(enc, min_code_size=mcs) == idx).all(), mcs
    for bad in (0, 1, 9):
        with pytest.raises(ValueError):
            lzw_encode(np.zeros(4, dtype=np.uint8), min_code_size=bad)
        with pytest.raises(ValueError):
            lzw_decode(b"\x00", min_code_size=bad)
