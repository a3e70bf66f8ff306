"""Baseline JPEG codec (operators/jpeg.py): pure-math invariants a shared
encoder/decoder bug could not fake (zigzag anchors from the spec, DCT
orthonormality), exactness where JPEG IS exact (DC-flat blocks), PSNR
envelopes where it is lossy, structural conformance of the emitted stream,
honest refusal of unsupported variants, and the Spark decode→stats path."""

import struct

import numpy as np
import pytest

from exstream_implementation_spark.operators.jpeg import (
    DCT,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_zigzag_is_the_spec_scan():
    # involution + the first diagonal walk and terminal cell of ISO 10918's
    # zigzag — anchors typed from the spec figure, the rest generated
    assert (np.arange(64)[ZIGZAG][UNZIGZAG] == np.arange(64)).all()
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[63] == 63


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT @ DCT.T, np.eye(8), atol=1e-12)
    # DC row: constant block → single DC coefficient
    coefs = DCT @ np.full((8, 8), 7.0) @ DCT.T
    assert abs(coefs[0, 0] - 56.0) < 1e-9  # 7 · 8 (orthonormal scaling)
    assert np.abs(coefs).sum() - abs(coefs[0, 0]) < 1e-9


def test_flat_image_roundtrips_exactly():
    # a constant image quantizes to DC-only blocks with zero error
    for level in (0, 128, 255):
        img = np.full((16, 24, 3), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=85))
        assert int(np.abs(out.astype(int) - level).max()) <= 1, level


@pytest.mark.parametrize("h,w", [(8, 8), (40, 56), (13, 9), (1, 1), (9, 32)])
def test_roundtrip_psnr(h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 4) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (h, w, 3)
    assert _psnr(dec, img) > 35.0


def test_roundtrip_noise_psnr():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    assert _psnr(decode_jpeg(encode_jpeg(img, quality=95)), img) > 30.0


def test_quality_monotonicity():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p50 = _psnr(decode_jpeg(encode_jpeg(img, quality=50)), img)
    p95 = _psnr(decode_jpeg(encode_jpeg(img, quality=95)), img)
    assert p95 > p50
    assert len(encode_jpeg(img, quality=95)) > len(encode_jpeg(img, quality=50))


def test_stream_structure_is_conformant():
    """Marker walk of our own emission: SOI, APP0(JFIF), 2 DQT, SOF0 with
    4:4:4 sampling, 4 DHT, SOS, EOI at the end — the segments any standard
    decoder needs, in a legal order, with self-consistent lengths."""
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    b = encode_jpeg(img, quality=85)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while pos < len(b):
        marker = struct.unpack_from(">H", b, pos)[0]
        seen.append(marker)
        ln = struct.unpack_from(">H", b, pos + 2)[0]
        if marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", b, pos + 4)
            assert (prec, h, w, nc) == (8, 8, 8, 3)
            assert b[pos + 11] == 0x11  # comp 1 sampling = 4:4:4
        if marker == 0xFFDA:
            break
        pos += 2 + ln
    assert seen.count(0xFFDB) == 2 and seen.count(0xFFC4) == 4
    assert 0xFFE0 in seen and seen[-1] == 0xFFDA


def test_refuses_unsupported_variants():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    sof = bytes(b).find(b"\xff\xc0")
    # lossless sequential: flip SOF0 → SOF3
    lossless = bytearray(b)
    lossless[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(lossless))
    # arithmetic-coded progressive: flip SOF0 → SOF10
    arith = bytearray(b)
    arith[sof + 1] = 0xCA
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))
    # 12-bit precision
    deep = bytearray(b)
    deep[sof + 4] = 12
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(deep))
    # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


@pytest.mark.parametrize("sub", ["420", "422"])
@pytest.mark.parametrize("h,w", [(16, 16), (37, 53), (9, 8), (17, 31)])
def test_subsampled_roundtrip_psnr(sub, h, w):
    # chroma subsampling is lossy in chroma only: a smooth image must
    # round-trip within a PSNR envelope at every edge-padding geometry
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 3 + y * 2) % 256, (x + y * 4) % 256, (255 - x * 2 - y) % 256],
        axis=-1,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == (h, w, 3)
    assert _psnr(dec, img) > 32.0, (sub, h, w)


def test_subsampled_flat_roundtrips_exactly():
    # constant color → DC-only blocks in Y AND the box-averaged chroma:
    # 4:2:0 must be exact here despite the 2×2 average + upsample
    for level in (0, 77, 200, 255):
        img = np.full((24, 40, 3), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=85, subsampling="420"))
        assert int(np.abs(out.astype(int) - level).max()) <= 1, level


def test_subsampled_sof_declares_factors():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    b = encode_jpeg(img, subsampling="420")
    sof = b.find(b"\xff\xc0")
    assert b[sof + 11] == 0x22  # Y: 2x2
    assert b[sof + 14] == 0x11 and b[sof + 17] == 0x11  # Cb/Cr: 1x1


def test_decodes_foreign_handbuilt_420_stream():
    """A 4:2:0 stream assembled BY HAND — fixed (non-optimized) Huffman
    tables, identity quantization, different table layout from our
    encoder — so the decode path is exercised against a stream our own
    encoder could never have produced.  16×16 constant RGB(200,200,200):
    Y DC = 8·(200-128) = 576 in the first Y block, every later diff 0,
    chroma DC 0 → decoded frame must be exactly 200 everywhere."""

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    # identity quant table tq=0 (natural order == any order when all 1s)
    out += seg(0xFFDB, bytes([0]) + bytes([1] * 64))
    # SOF0: 8-bit 16x16, Y 2x2 tq0, Cb/Cr 1x1 tq0
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table 0: canonical {sym 0: '0' (1 bit), sym 10: '10' (2 bits)}
    dc_bits = [1, 1] + [0] * 14
    out += seg(0xFFC4, bytes([0x00] + dc_bits + [0, 10]))
    # AC table 0: single symbol EOB '0'
    ac_bits = [1] + [0] * 15
    out += seg(0xFFC4, bytes([0x10] + ac_bits + [0]))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    # entropy: Y1 = DC sym 10 ('10') + 576 in 10 bits + EOB ('0');
    # Y2-4, Cb, Cr = DC sym 0 ('0') + EOB ('0'); pad with 1s
    bits = "10" + format(576, "010b") + "0" + "00" * 5
    bits += "1" * (-len(bits) % 8)
    out += int(bits, 2).to_bytes(len(bits) // 8, "big")
    out += b"\xff\xd9"
    dec = decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)
    assert (dec == 200).all()


def test_spark_image_stats_over_jpeg_payloads(spark):
    """The full Spark path — attach JPEG payloads, decode in Arrow workers,
    compute pixel stats — must land within quantization distance of the
    exact (BMP-path) stats.  JPEG is lossy, so this is a tolerance gate,
    not the hash gate BMP/PNG get."""
    from exstream_implementation_spark.operators.multimodal import (
        attach_image_payload,
        image_stats,
    )
    from exstream_implementation_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 20"
    )
    key = ["doc_id", "channel"]
    exact = {
        tuple(r[k] for k in key): (r["px_mean"], r["px_std"])
        for r in image_stats(attach_image_payload(docs, fmt="bmp")).collect()
    }
    lossy = {
        tuple(r[k] for k in key): (r["px_mean"], r["px_std"])
        for r in image_stats(attach_image_payload(docs, fmt="jpeg")).collect()
    }
    assert set(lossy) == set(exact) and len(exact) == 60
    for k in exact:
        assert abs(lossy[k][0] - exact[k][0]) < 4.0, k
        assert abs(lossy[k][1] - exact[k][1]) < 8.0, k


def test_fill_bytes_and_standalone_markers_in_header():
    """ITU T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker
    code, and TEM (FF01) / RSTn (FFD0-FFD7) are length-less standalone
    markers.  A conformant foreign stream using either must decode
    identically to the plain stream (ADVICE r08)."""
    y, x = np.mgrid[0:16, 0:24]
    img = np.stack(
        [(x * 9) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)
    plain = encode_jpeg(img, quality=85)
    # inject after SOI: standalone TEM, standalone RST0, then a 0xFF fill
    # run that merges into the following APP0 marker's leading 0xFF
    padded = plain[:2] + b"\xff\x01\xff\xd0\xff\xff" + plain[2:]
    assert (decode_jpeg(padded) == decode_jpeg(plain)).all()


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_intervals_roundtrip(sub, ri):
    # DRI/RSTn streams must decode pixel-identically to the same image
    # encoded WITHOUT restarts (restarts change framing, not content),
    # and ri=0 must stay byte-stable with earlier rounds' streams
    y, x = np.mgrid[0:37, 0:53]
    img = np.stack(
        [(x * 3 + y * 2) % 256, (x + y * 4) % 256, (255 - x - y) % 256],
        axis=-1,
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    dec = decode_jpeg(
        encode_jpeg(img, quality=90, subsampling=sub, restart_interval=ri)
    )
    assert (dec == base).all()
    assert encode_jpeg(img, quality=90, subsampling=sub) == encode_jpeg(
        img, quality=90, subsampling=sub, restart_interval=0
    )


def test_restart_sequence_error_detected():
    # corrupting an RST marker's sequence number must fail loudly, not
    # silently desynchronize the DC predictors
    img = (np.arange(32 * 32 * 3, dtype=np.uint8) % 251).reshape(32, 32, 3)
    b = bytearray(encode_jpeg(img, quality=85, restart_interval=2))
    sos = bytes(b).find(b"\xff\xda")
    # find the first RST marker in the entropy stream and bump its index
    i = sos + 2
    while i < len(b) - 1:
        if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7:
            b[i + 1] = 0xD0 + ((b[i + 1] - 0xD0 + 1) % 8)
            break
        i += 1
    else:
        pytest.fail("no RST marker found")
    with pytest.raises(ValueError, match="RST sequence"):
        decode_jpeg(bytes(b))


# --- progressive (SOF2) -------------------------------------------------------
@pytest.mark.parametrize(
    "h,w,sub,q",
    [(16, 16, "444", 85), (17, 13, "420", 70), (24, 9, "422", 90),
     (8, 8, "444", 95), (40, 40, "420", 60)],
)
def test_progressive_decode_matches_baseline(h, w, sub, q):
    """The progressive path entropy-codes the SAME quantized coefficients as
    the sequential path, so decoding either stream must give bit-identical
    pixels — any mis-coded coefficient in any of the ten scans (spectral
    bands, successive-approximation bits, EOB runs) breaks this."""
    rng = np.random.default_rng(h * 100 + w)
    yy, xx = np.mgrid[0:h, 0:w]
    for img in (
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        np.stack([(yy * 3 + xx * 2) % 256, (yy + xx) % 256, (xx * 5) % 256],
                 axis=-1).astype(np.uint8),
    ):
        seq = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        pb = encode_jpeg(img, quality=q, subsampling=sub, progressive=True)
        np.testing.assert_array_equal(decode_jpeg(pb), seq)


def test_progressive_stream_structure():
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    pb = encode_jpeg(img, progressive=True)
    assert pb[:2] == b"\xff\xd8" and pb[-2:] == b"\xff\xd9"
    # SOF2, not SOF0, and libjpeg's ten-scan default script
    assert b"\xff\xc2" in pb
    assert pb.count(b"\xff\xda") == 10
    sof = pb.find(b"\xff\xc2")
    assert pb[sof + 4] == 8  # precision
    # the sequential encoding of the same image stays SOF0
    assert b"\xff\xc2" not in encode_jpeg(img)


def test_progressive_flat_image_roundtrips_exactly():
    """DC-flat blocks are exact through quantization, and a flat image is
    the EOB-run-heaviest possible input (every AC scan is pure EOB runs)."""
    img = np.full((24, 24, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert (out == img).all()


@pytest.mark.parametrize("sub,ri", [("444", 2), ("420", 3), ("422", 1)])
def test_progressive_restart_intervals(sub, ri):
    """DRI in progressive mode: RSTn every ri MCU units of EACH scan (one
    block for the non-interleaved AC scans), DC predictors and EOB runs
    reset — still bit-identical to the sequential decode."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    seq = decode_jpeg(encode_jpeg(img, subsampling=sub))
    pb = encode_jpeg(img, subsampling=sub, progressive=True,
                     restart_interval=ri)
    assert any(bytes([0xFF, 0xD0 + i]) in pb for i in range(8))
    np.testing.assert_array_equal(decode_jpeg(pb), seq)


def test_decodes_foreign_handbuilt_progressive_stream():
    """A progressive stream assembled BY HAND from T.81 — fixed Huffman
    tables, identity quantization, a 3-scan script (interleaved DC first at
    Al=1, a spectral AC scan for Y, then a DC refinement scan) that our
    encoder never emits — decoding to exactly the pixels computed from an
    independent IDCT.  Exercises: successive-approximation DC (first +
    refine), AC first-pass run coding, EOB, per-scan table reuse."""

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def pack_bits(bits):
        bits += "1" * (-len(bits) % 8)
        raw = int(bits, 2).to_bytes(len(bits) // 8, "big")
        return raw.replace(b"\xff", b"\xff\x00")

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes([1] * 64))  # identity quant
    # SOF2: 8-bit 8x8, three 1x1 components, all tq=0
    out += seg(
        0xFFC2,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table 0: single symbol (category 2), 1-bit code '0'
    out += seg(0xFFC4, bytes([0x00] + [1] + [0] * 15 + [2]))
    # AC table 0: syms {0x00 EOB, 0x02, 0x22} all 2 bits → '00','01','10'
    out += seg(0xFFC4, bytes([0x10] + [0, 3] + [0] * 14 + [0x00, 0x02, 0x22]))
    # scan 1 — DC first, interleaved, Al=1.  True DCs: Y 5, Cb -4, Cr 6 →
    # sent v>>1 (arithmetic): 2, -2, 3; all category 2
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    out += pack_bits("0" + "10" + "0" + "01" + "0" + "11")
    # scan 2 — AC first for Y, Ss=1 Se=63 Al=0: zigzag k1=-3 (r0s2, bits
    # '00'), then 2 zeros, k4=2 (r2s2 → 0x22, bits '10'), then EOB
    out += seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += pack_bits("01" + "00" + "10" + "10" + "00")
    # scan 3 — DC refinement, Ah=1 Al=0: raw bits (5&1, -4&1, 6&1) = 1,0,0
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    out += pack_bits("100")
    out += b"\xff\xd9"

    # expected pixels via an INDEPENDENT inverse DCT + BT.601 inverse
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    d[0, :] = np.sqrt(1 / 8)
    cy = np.zeros((8, 8))
    cy[0, 0], cy[0, 1], cy[1, 1] = 5, -3, 2  # zigzag 0,1,4 in natural order
    y = d.T @ cy @ d + 128.0
    cb = np.full((8, 8), -4 / 8 + 128.0)
    cr = np.full((8, 8), 6 / 8 + 128.0)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    want = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)

    dec = decode_jpeg(bytes(out))
    np.testing.assert_array_equal(dec, want.astype(np.uint8))


def test_progressive_extreme_qualities_and_geometries():
    """Quality 1 (EOB-run-saturated) through 100, single-pixel, 1×N and
    N×1 frames — every progressive stream still decodes pixel-identically
    to its sequential twin."""
    rng = np.random.default_rng(3)
    for q in (1, 100):
        img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img, quality=q, progressive=True)),
            decode_jpeg(encode_jpeg(img, quality=q)),
        )
    for h, w in ((1, 1), (1, 64), (64, 1), (2, 3)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img, quality=30, progressive=True)),
            decode_jpeg(encode_jpeg(img, quality=30)),
        )


def test_spark_image_stats_over_progressive_jpeg_payloads(spark):
    """Same Arrow-worker decode path, but with SOF2 ten-scan payloads —
    progressive streams carry the SAME quantized coefficients, so their
    decoded stats must EQUAL the baseline-JPEG stats exactly, not just
    fall inside the lossy tolerance."""
    from exstream_implementation_spark.operators.multimodal import (
        attach_image_payload,
        image_stats,
    )
    from exstream_implementation_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 12"
    )
    key = ["doc_id", "channel"]
    base = {
        tuple(r[k] for k in key): (r["px_mean"], r["px_std"])
        for r in image_stats(attach_image_payload(docs, fmt="jpeg")).collect()
    }
    prog = {
        tuple(r[k] for k in key): (r["px_mean"], r["px_std"])
        for r in image_stats(
            attach_image_payload(docs, fmt="jpeg_progressive")
        ).collect()
    }
    assert prog == base and len(base) == 36


def test_sequential_scan_rejects_progressive_eobn():
    """A baseline (SOF0) stream whose entropy data contains an EOBn symbol
    (progressive-only, size=0 run∉{0,15}) must refuse loudly — decoding on
    would silently desynchronize every later coefficient."""

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes([1] * 64))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table 0: single symbol (category 0) → code '0' is 0 bits of diff
    out += seg(0xFFC4, bytes([0x00] + [1] + [0] * 15 + [0]))
    # AC table 0: {0x00 EOB: '0', 0x10 EOB2: '10'} — 0x10 is progressive-only
    out += seg(0xFFC4, bytes([0x10] + [1, 1] + [0] * 14 + [0x00, 0x10]))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    # Y1 block: DC '0' then AC symbol '10' (EOB2) — illegal in baseline
    bits = "0" + "10"
    bits += "1" * (-len(bits) % 8)
    out += int(bits, 2).to_bytes(len(bits) // 8, "big")
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="bad AC symbol"):
        decode_jpeg(bytes(out))


def test_rejects_nonconformant_progressive_scan_headers():
    """T.81 §B.2.3: an AC scan (Ss>0) carries exactly one component; Ss/Se
    must be an ascending band within 0..63; Ah/Al fit in 13 bits of
    point-transform.  A multi-component AC scan used to fall into the
    interleaved-MCU path with one shared EOB state and silently misdecode —
    it must be rejected instead."""
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    pb = encode_jpeg(img, progressive=True)

    def sos_offsets(b):
        offs, p = [], 0
        while True:
            p = b.find(b"\xff\xda", p)
            if p < 0:
                return offs
            offs.append(p)
            p += 2

    first = sos_offsets(pb)[0]  # DC scan: Ns=3 interleaved, Ss=0
    ns = pb[first + 4]
    assert ns == 3
    ss_at = first + 4 + 1 + 2 * ns
    bad = bytearray(pb)
    bad[ss_at] = 1  # claim a multi-component AC scan
    with pytest.raises(ValueError, match="Ns=1"):
        decode_jpeg(bytes(bad))

    # descending spectral band (Se < Ss) on a genuine single-component scan
    ac = next(o for o in sos_offsets(pb) if pb[o + 4] == 1)
    ss_ac = ac + 4 + 1 + 2
    assert pb[ss_ac] > 0
    bad2 = bytearray(pb)
    bad2[ss_ac + 1] = 0  # Se = 0 < Ss
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(bytes(bad2))

    # successive-approximation nibble out of range
    bad3 = bytearray(pb)
    bad3[ss_ac + 2] = 0xEE  # Ah=14, Al=14
    with pytest.raises(ValueError, match="successive approximation"):
        decode_jpeg(bytes(bad3))
