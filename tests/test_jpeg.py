"""Baseline JPEG codec (operators/jpeg.py): encode/decode round-trips,
the 4:2:0 MCU-interleave decode path, honest refusal boundaries, and
the Spark strict-mode decode/resize stages over real JPEG bytes —
closing the last multimodal strict refusal from the round-9 verdict."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdata_infra_cs489_spark.operators.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    _BitWriter,
    _build_huffman_codes,
    _dht_segment,
    _dqt_segment,
    _encode_block,
    _pad_to_blocks,
    _rgb_to_ycbcr,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_table,
)


def test_gray_roundtrip_q100_tight():
    """quality 100 => all-ones quant tables, so the only loss is DCT
    float rounding: every pixel within 2, most exact."""
    rng = np.random.default_rng(11)
    for w, h in [(8, 8), (16, 8), (13, 11), (1, 1), (9, 17)]:
        px = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
        gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, px, 1, quality=100))
        assert (gw, gh, gc) == (w, h, 1)
        err = np.abs(
            np.frombuffer(px, np.uint8).astype(int)
            - np.frombuffer(out, np.uint8).astype(int)
        )
        assert err.max() <= 2


def test_rgb_roundtrip_q100():
    """color adds YCbCr <-> RGB rounding on top of the DCT loss; still a
    tight bound at quality 100."""
    rng = np.random.default_rng(13)
    for w, h in [(8, 8), (24, 16), (13, 11)]:
        px = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
        gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, px, 3, quality=100))
        assert (gw, gh, gc) == (w, h, 3)
        err = np.abs(
            np.frombuffer(px, np.uint8).astype(int)
            - np.frombuffer(out, np.uint8).astype(int)
        )
        assert err.max() <= 6


def test_lossy_quality_still_close_on_smooth_image():
    """Annex-K tables at quality 75 keep a smooth gradient visually
    intact (the point of the quantizer: low-frequency fidelity)."""
    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.tile(x, (32, 1))
    _w, _h, _c, out = decode_jpeg(
        encode_jpeg(64, 32, img.tobytes(), 1, quality=75)
    )
    got = np.frombuffer(out, np.uint8).reshape(32, 64).astype(int)
    assert np.abs(img.astype(int) - got).mean() < 2.0


def test_quality_scaling_monotone_and_q100_is_ones():
    from bigdata_infra_cs489_spark.operators.jpeg import QUANT_LUMA

    assert (scaled_quant_table(QUANT_LUMA, 100) == 1).all()
    t50 = scaled_quant_table(QUANT_LUMA, 50)
    assert (t50 == np.array(QUANT_LUMA)).all()  # scale 100% at q50
    assert (scaled_quant_table(QUANT_LUMA, 10) >= t50).all()


def _encode_420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                width: int, height: int) -> bytes:
    """Minimal hand-rolled 4:2:0 encoder (2x2 luma sampling) used ONLY
    to exercise the decoder's MCU interleave + chroma upsample path —
    the module encoder deliberately emits 4:4:4."""
    q = np.ones(64)
    dc_l = _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, np.ones(64, dtype=np.int32))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    wtr = _BitWriter()
    yp = _pad_to_blocks(y)
    cbp = _pad_to_blocks(cb)
    crp = _pad_to_blocks(cr)
    preds = [0, 0, 0]
    for my in range(yp.shape[0] // 16):
        for mx in range(yp.shape[1] // 16):
            for bv in range(2):
                for bh in range(2):
                    blk = yp[(my * 2 + bv) * 8 : (my * 2 + bv) * 8 + 8,
                             (mx * 2 + bh) * 8 : (mx * 2 + bh) * 8 + 8]
                    preds[0] = _encode_block(wtr, blk, q, dc_l, ac_l, preds[0])
            cblk = cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[1] = _encode_block(wtr, cblk, q, dc_c, ac_c, preds[1])
            rblk = crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[2] = _encode_block(wtr, rblk, q, dc_c, ac_c, preds[2])
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_decode_420_subsampled():
    """A hand-built 4:2:0 stream with constant chroma decodes to the
    exact solid color: validates MCU interleave order (4 Y blocks, then
    Cb, Cr) and the nearest chroma upsample."""
    w = h = 16
    rgb = np.full((h, w, 3), [180, 90, 40], dtype=np.uint8)
    ycc = _rgb_to_ycbcr(rgb)
    y = ycc[..., 0]
    cb = ycc[::2, ::2, 1]  # constant, so subsampling is lossless
    cr = ycc[::2, ::2, 2]
    gw, gh, gc, out = decode_jpeg(_encode_420(y, cb, cr, w, h))
    assert (gw, gh, gc) == (w, h, 3)
    got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - rgb.astype(int)).max() <= 2


def test_refusal_boundaries():
    # progressive (SOF2)
    prog = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)
    # header-only synthetic (SOI + SOF0, no SOS) -> truncated, ValueError
    hdr = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
           + struct.pack(">BHHB", 8, 32, 16, 1) + bytes([1, 0x11, 0])
           + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(hdr)
    # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG....")
    # encoder refuses unsupported channel counts / bad buffers
    with pytest.raises(ValueError):
        encode_jpeg(2, 2, b"\x00" * 8, channels=2)
    with pytest.raises(ValueError):
        encode_jpeg(2, 2, b"\x00" * 3, channels=1)


def test_appn_and_com_segments_skipped():
    """Real crawl JPEGs lead with APP0/EXIF blocks; the marker walk must
    skip them by length."""
    px = bytes(range(64))
    b = bytearray(encode_jpeg(8, 8, px, 1, quality=100))
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    spliced = bytes(b[:2]) + app0 + com + bytes(b[2:])
    gw, gh, gc, out = decode_jpeg(spliced)
    assert (gw, gh, gc) == (8, 8, 1)
    err = np.abs(
        np.frombuffer(px, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    )
    assert err.max() <= 2


def test_fill_bytes_and_standalone_markers_skipped():
    """T.81 B.1.1.2: any marker may be padded by 0xFF fill bytes, and
    TEM (0x01) is standalone (length-less). A spec-legal stream using
    both must still decode, not be skipped by garbage offsets
    (round-11 advisory)."""
    px = bytes(range(64))
    b = encode_jpeg(8, 8, px, 1, quality=100)
    # pad the first post-SOI marker with a fill-byte run and splice a
    # standalone TEM marker between header segments
    spliced = b[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xff" + b[2:]
    gw, gh, gc, out = decode_jpeg(spliced)
    assert (gw, gh, gc) == (8, 8, 1)
    err = np.abs(
        np.frombuffer(px, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    )
    assert err.max() <= 2


def test_spark_strict_decode_and_resize_real_jpeg(spark):
    """The mapInPandas strict stages decode and resize REAL baseline
    JPEGs end-to-end: dims come from the entropy-decoded pixel buffer,
    and resize output re-decodes at the target dimensions."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    rng = np.random.default_rng(17)
    rows = []
    for doc_id, (w, h, ch) in enumerate([(16, 12, 1), (24, 16, 3)]):
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
        rows.append((doc_id, bytearray(encode_jpeg(w, h, px, ch))))
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {r["doc_id"]: r for r in decode_media(df, strict=True).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (16, 12, 1)
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (24, 16, 3)
    out = {
        r["doc_id"]: bytes(r["media"])
        for r in resize_media(df, strict=True, target_w=8, target_h=8).collect()
    }
    for doc_id, ch in [(0, 1), (1, 3)]:
        gw, gh, gc, _px = decode_jpeg(out[doc_id])
        assert (gw, gh, gc) == (8, 8, ch)


def test_restart_marker_roundtrip():
    """restart_interval emits DRI + byte-aligned RSTn markers with DC
    predictor resets; the decoder's align/reset path recovers the image
    to the same q100 bound, across interval sizes that do and don't
    divide the MCU count (incl. >8 intervals to wrap RST7->RST0)."""
    rng = np.random.default_rng(29)
    w, h = 40, 32  # 5 x 4 = 20 MCUs
    px = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
    for ri in (1, 2, 3, 7):
        b = encode_jpeg(w, h, px, 1, quality=100, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI present
        n_rst = sum(b.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst >= (20 - 1) // ri  # counts may collide with data
        gw, gh, gc, out = decode_jpeg(b)
        assert (gw, gh, gc) == (w, h, 1)
        err = np.abs(
            np.frombuffer(px, np.uint8).astype(int)
            - np.frombuffer(out, np.uint8).astype(int)
        )
        assert err.max() <= 2, ri
    # color 4:4:4 with restarts too
    px3 = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
    b = encode_jpeg(w, h, px3, 3, quality=100, restart_interval=4)
    gw, gh, gc, out = decode_jpeg(b)
    assert (gw, gh, gc) == (w, h, 3)
    err = np.abs(
        np.frombuffer(px3, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    )
    assert err.max() <= 6
