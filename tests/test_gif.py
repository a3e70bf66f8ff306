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


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_decodes_interlaced_stream():
    """A hand-interlaced stream (rows emitted in the spec's 4-pass order,
    interlace flag set) must decode to the same pixels as the progressive
    stream of the same frame."""
    import struct

    rng = np.random.default_rng(13)
    h, w = 11, 6  # odd height exercises uneven pass lengths
    grid = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    plain = decode_gif(encode_gif([PALETTE[grid.astype(np.int64)]]))[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8),
         np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += PALETTE.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    out.append(8)
    out += _sub_blocks(lzw_encode(grid[order].reshape(-1)))
    out.append(0x3B)
    np.testing.assert_array_equal(decode_gif(bytes(out))[0], plain)


def test_decodes_local_color_table_without_global():
    """No global table at all; a 4-entry per-image local table supplies the
    colors (a shape our encoder never emits)."""
    import struct

    lct = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    grid = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)  # no GCT
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0x80 | 0x01)  # 4-entry LCT
    out += lct.tobytes()
    out.append(2)  # min code size for a 4-color stream
    out += _sub_blocks(lzw_encode(grid.reshape(-1), min_code_size=2))
    out.append(0x3B)
    frames = decode_gif(bytes(out))
    np.testing.assert_array_equal(frames[0], lct[grid.astype(np.int64)])


def test_partial_frame_composition_transparency_and_disposal():
    """Real animation shape: a full base frame, then a transparent patch
    with disposal 3 (restore previous), then a patch with disposal 0 —
    each emitted canvas pinned exactly."""
    import struct

    def gce(disposal, transparent=None):
        pf = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
        return bytes([0x21, 0xF9, 4, pf, 0, 0, transparent or 0, 0])

    def image(left, top, grid, mcs=8, iflags=0x00):
        fh, fw = grid.shape
        blk = struct.pack("<BHHHHB", 0x2C, left, top, fw, fh, iflags)
        return blk + bytes([mcs]) + _sub_blocks(
            lzw_encode(grid.reshape(-1), min_code_size=mcs)
        )

    base = np.full((4, 4), 36, dtype=np.uint8)  # palette idx 36
    # patch: idx 219 with one transparent pixel (idx 7 marked transparent)
    patch = np.array([[219, 7], [219, 219]], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0)
    out += PALETTE.tobytes()
    out += gce(0) + image(0, 0, base)
    out += gce(3, transparent=7) + image(1, 1, patch)  # restore-previous
    out += gce(0) + image(0, 2, np.full((1, 2), 100, dtype=np.uint8))
    out.append(0x3B)
    f = decode_gif(bytes(out))
    assert len(f) == 3
    np.testing.assert_array_equal(f[0], PALETTE[np.full((4, 4), 36)])
    want1 = np.full((4, 4), 36)
    want1[1, 1] = 219  # transparent pixel at (1,2) keeps the base color
    want1[2, 1:3] = [219, 219]
    np.testing.assert_array_equal(f[1], PALETTE[want1])
    # disposal 3 restored the patch region before frame 3's own patch
    want2 = np.full((4, 4), 36)
    want2[2, 0:2] = 100
    np.testing.assert_array_equal(f[2], PALETTE[want2])


def test_refuses_malformed_streams():
    img = PALETTE[np.zeros((4, 4), dtype=np.int64)]
    b = bytearray(encode_gif([img]))
    desc = bytes(b).find(b"\x2c")
    # frame escaping the logical screen
    oob = bytearray(b)
    oob[desc + 1] = 3  # left = 3 on a 4-wide screen with a 4-wide frame
    with pytest.raises(ValueError):
        decode_gif(bytes(oob))
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


def test_transparent_index_beyond_palette_is_legal():
    """Real encoders routinely pick a transparent index at or past the
    color-table size — it is never dereferenced, so decode must not
    bounds-fail on it."""
    import struct

    lct = np.array([[9, 9, 9], [200, 0, 0]], dtype=np.uint8)
    grid = np.array([[1, 3], [1, 1]], dtype=np.uint8)  # 3 >= len(lct)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 3, 0])  # transparent idx 3
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0x80 | 0x00)  # 2-entry LCT
    out += lct.tobytes()
    out.append(2)
    out += _sub_blocks(lzw_encode(grid.reshape(-1), min_code_size=2))
    out.append(0x3B)
    f = decode_gif(bytes(out))
    want = np.zeros((2, 2, 3), np.uint8)
    want[0, 0] = want[1, 0] = want[1, 1] = [200, 0, 0]
    # the transparent pixel keeps the initial (black) canvas
    np.testing.assert_array_equal(f[0], want)
    # a genuinely dereferenced out-of-range index still refuses
    bad = np.array([[1, 3], [1, 1]], dtype=np.uint8)
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
    out2 += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0x80 | 0x00)
    out2 += lct.tobytes()
    out2.append(2)
    out2 += _sub_blocks(lzw_encode(bad.reshape(-1), min_code_size=2))
    out2.append(0x3B)
    with pytest.raises(ValueError):
        decode_gif(bytes(out2))


def test_truncated_streams_raise_valueerror():
    """Every mid-structure truncation point must surface as the module's
    ValueError convention for malformed input, never a raw IndexError or
    struct.error from running off the buffer (r10 advice)."""
    rng = np.random.default_rng(5)
    frames = [PALETTE[rng.integers(0, 256, (13, 17))] for _ in range(2)]
    payload = encode_gif(frames)
    # drop the trailer so truncations inside the last block aren't masked
    body = payload[:-1]
    for cut in range(4, len(body)):
        try:
            decode_gif(body[:cut])
        except ValueError:
            pass  # the only acceptable failure mode
        # a prefix that still holds >=1 complete frame may decode fine
