"""Multimodal plumbing: schema, determinism, stub gating."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from .oracle import assert_matches_oracle


def test_media_meta_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["media_meta"]
    sql = entrymod.oracle_sql()["media_meta"]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def _expected_media(doc_id: int, text: str) -> bytes:
    """Python twin of attach_media's header+payload generation."""
    import struct

    payload = hashlib.md5(text.encode()).digest() * (doc_id % 4 + 1)
    w, hh = 16 + doc_id % 112, 16 + (doc_id * 7) % 112
    ch, sr = 1 + doc_id % 2, 8000 * (1 + doc_id % 5)
    dl = 16 * (doc_id % 4 + 1)
    if doc_id % 3 == 0:  # PNG
        hdr = (
            bytes.fromhex("89504E470D0A1A0A0000000D49484452")
            + struct.pack(">II", w, hh)
            + bytes.fromhex("080200000000000000")
        )
    elif doc_id % 3 == 1:  # canonical WAV
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + dl)
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
            + b"data"
            + struct.pack("<I", dl)
        )
    else:  # JPEG SOI + SOF0; filler is 0xFF-free by construction (the
        # hex 'f'->'e' translate — see attach_media's docstring)
        hdr = (
            bytes.fromhex("FFD8FFC0000B08")
            + struct.pack(">HH", hh, w)
            + bytes.fromhex("01011100")
        )
        payload = bytes.fromhex(
            (hashlib.md5(text.encode()).hexdigest() * (doc_id % 4 + 1))
            .replace("f", "e")
        )
    return hdr + payload


def test_media_binary_derivation(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.multimodal import media_table

    rows = media_table(spark, sf_correct).limit(50).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_correct}/documents.parquet')"
        ).fetchall()
    )
    for r in rows:
        assert bytes(r.media) == _expected_media(r.doc_id, texts[r.doc_id])
        assert r.meta.n_bytes == len(bytes(r.media))


def test_media_meta_parses_real_headers(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.multimodal import media_meta

    rows = {r.doc_id: r for r in media_meta(spark, sf_smoke).collect()}
    for doc_id, r in rows.items():
        if doc_id % 3 == 0:
            assert r.media_type == "image"
            assert (r.width, r.height) == (
                16 + doc_id % 112,
                16 + (doc_id * 7) % 112,
            )
            assert r.channels is None and r.sample_rate is None
        elif doc_id % 3 == 1:
            assert r.media_type == "audio"
            assert (r.channels, r.sample_rate) == (
                1 + doc_id % 2,
                8000 * (1 + doc_id % 5),
            )
            assert r.width is None and r.height is None
        else:
            assert r.media_type == "video"
            assert (r.width, r.height) == (
                16 + doc_id % 112,
                16 + (doc_id * 7) % 112,
            )


def test_decode_strict_refuses_undecodable_containers(spark, sf_smoke):
    """strict mode must never present header-only results as a decode:
    the synthetic PNG fixtures carry no IDAT and the synthetic JPEG
    keyframes carry no SOS/entropy data (pixel decode impossible) —
    both raise. Real encoded streams decode: tests/test_jpeg.py and the
    PNG/WAV round-trips below."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_media,
        media_table,
    )

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    m = media_table(spark, sf_smoke)
    for family in (0, 2):  # header-only PNG, JPEG
        with pytest.raises((PythonException, Py4JJavaError)):
            decode_media(
                m.where(F.col("doc_id") % 3 == family).limit(4), strict=True
            ).collect()


def test_decode_strict_decodes_pcm_wav_fixture(spark, sf_smoke):
    """The synthetic WAV docs are genuine PCM-16 containers, so strict
    sample-level decode succeeds on them and recovers the generation
    rule's channel count."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_media,
        media_table,
    )

    wav = media_table(spark, sf_smoke).where(F.col("doc_id") % 3 == 1)
    rows = decode_media(wav, strict=True).collect()
    assert rows
    for r in rows:
        assert (r.width, r.height) == (None, None)
        assert r.channels == 1 + r.doc_id % 2


def test_header_decode_matches_generation(spark, sf_smoke):
    """decode_media's Python header parser recovers the generation-rule
    dims: PNG/JPEG width+height (PNG truecolor -> 3 channels, JPEG 1
    component), WAV channels with no spatial dims."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_media,
        media_table,
    )

    df = media_table(spark, sf_smoke)
    rows = {r.doc_id: r for r in decode_media(df).collect()}
    again = {r.doc_id: r for r in decode_media(df).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
    for doc_id, r in rows.items():
        w, h = 16 + doc_id % 112, 16 + (doc_id * 7) % 112
        if doc_id % 3 == 0:  # PNG
            assert (r.width, r.height, r.channels) == (w, h, 3)
        elif doc_id % 3 == 1:  # WAV
            assert (r.width, r.height) == (None, None)
            assert r.channels == 1 + doc_id % 2
        else:  # JPEG
            assert (r.width, r.height, r.channels) == (w, h, 1)


def test_features_shape_and_determinism(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.multimodal import (
        N_FEATURES,
        extract_features,
        media_table,
    )

    rows = extract_features(media_table(spark, sf_smoke)).collect()
    assert all(len(r.features) == N_FEATURES for r in rows)
    one = [r for r in rows if r.doc_id == 0][0]
    con = duckdb.connect()
    text0 = con.execute(
        "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') WHERE doc_id = 0"
    ).fetchone()[0]
    media0 = _expected_media(0, text0)
    digest = hashlib.md5(media0.hex().upper().encode()).digest()
    want = [digest[i] / 256.0 for i in range(N_FEATURES)]
    assert [pytest.approx(f, abs=1e-6) for f in want] == list(one.features)


def test_video_frames_only_video_docs(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_table,
        sample_frames,
    )

    rows = sample_frames(media_table(spark, sf_smoke)).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 3 == 2  # media_type cycle: doc_id%3==2 -> video
        assert r.frame_idx % 2 == 0
        assert len(bytes(r.frame)) == 16


def test_resize_is_deterministic_fixed_size(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_table,
        resize_media,
    )

    m = media_table(spark, sf_smoke)
    a = resize_media(m, target_bytes=32).collect()
    b = resize_media(m, target_bytes=32).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    by_id_a = {r["doc_id"]: bytes(r["media"]) for r in a}
    by_id_b = {r["doc_id"]: bytes(r["media"]) for r in b}
    assert by_id_a == by_id_b
    assert all(len(v) == 32 for v in by_id_a.values())
    assert all(r["n_bytes"] == 32 for r in a)


def test_resize_strict_raises_for_headeronly_jpeg(spark, sf_smoke):
    """The synthetic MJPEG keyframes are SOI+SOF0 only (no scan data),
    so the real baseline decoder refuses them — truncated stream, not
    missing codec (real JPEGs resize: tests/test_jpeg.py)."""
    import pytest
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_table,
        resize_media,
    )

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    jpeg = media_table(spark, sf_smoke).where(F.col("doc_id") % 3 == 2)
    with pytest.raises((PythonException, Py4JJavaError)):
        resize_media(jpeg, strict=True).collect()


# --- real stdlib codecs (round 9): PNG / WAV strict paths -------------------


def _gradient_pixels(w: int, h: int, ch: int) -> bytes:
    return bytes(
        (x * 13 + y * 29 + c * 57) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_png_roundtrip_all_color_types():
    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    for ch in (1, 3, 4):
        px = _gradient_pixels(5, 4, ch)
        w, h, got_ch, got = decode_png(encode_png(5, 4, px, ch))
        assert (w, h, got_ch) == (5, 4, ch)
        assert got == px


def test_png_unfilter_matches_spec_filters():
    """Decode a hand-built PNG whose IDAT uses Sub/Up/Average/Paeth
    filtered scanlines — the decoder must reconstruct the same pixels an
    unfiltered encoding carries."""
    import struct
    import zlib

    from bigdata_infra_cs489_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    w, h, ch = 4, 5, 3
    px = _gradient_pixels(w, h, ch)
    stride = w * ch

    def filt(ftype: int, line: bytes, prev: bytes) -> bytes:
        out = bytearray()
        for i, x in enumerate(line):
            a = line[i - ch] if i >= ch else 0
            b, c = prev[i], (prev[i - ch] if i >= ch else 0)
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
        return bytes(out)

    ftypes = [0, 1, 2, 3, 4]
    raw = bytearray()
    prev = bytes(stride)
    for y, ftype in enumerate(ftypes):
        line = px[y * stride : (y + 1) * stride]
        raw += bytes([ftype]) + (line if ftype == 0 else filt(ftype, line, prev))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    b = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(b) == (w, h, ch, px)


def test_wav_roundtrip_and_chunk_walk():
    """decode_wav survives an extra chunk before fmt/data (a real RIFF
    walk, not fixed offsets) and recovers the exact int16 samples."""
    import struct

    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [0, 1000, -1000, 32767, -32768, 7, -7, 12345]
    raw = struct.pack(f"<{len(samples)}h", *samples)
    b = encode_wav(16000, 2, raw)
    assert decode_wav(b) == (16000, 2, samples)
    # splice a LIST chunk between WAVE and fmt
    spliced = b[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + b[12:]
    assert decode_wav(spliced) == (16000, 2, samples)


def test_resize_strict_png_nearest_neighbor(spark):
    """strict resize of a real zlib-PNG: output re-decodes to the target
    dims and every output pixel equals the nearest-neighbor source pixel."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_media,
    )

    w, h, ch, tw, th = 6, 4, 3, 3, 2
    px = _gradient_pixels(w, h, ch)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(w, h, px, ch)))], "doc_id bigint, media binary"
    )
    out = resize_media(df, strict=True, target_w=tw, target_h=th).collect()
    gw, gh, gch, gpx = decode_png(bytes(out[0]["media"]))
    assert (gw, gh, gch) == (tw, th, ch)
    for ty in range(th):
        for tx in range(tw):
            sx, sy = tx * w // tw, ty * h // th
            got = gpx[(ty * tw + tx) * ch : (ty * tw + tx + 1) * ch]
            want = px[(sy * w + sx) * ch : (sy * w + sx + 1) * ch]
            assert got == want, (tx, ty)


def test_resize_strict_wav_resamples_rate(spark):
    """strict resize of a PCM WAV halves the frame count when the target
    rate is half the source rate, keeping channel interleave intact."""
    import struct

    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        resize_media,
    )

    frames = [(i * 100, -i * 100) for i in range(8)]  # 8 stereo frames
    flat = [s for f in frames for s in f]
    b = encode_wav(16000, 2, struct.pack(f"<{len(flat)}h", *flat))
    df = spark.createDataFrame(
        [(1, bytearray(b))], "doc_id bigint, media binary"
    )
    out = resize_media(df, strict=True, target_rate=8000).collect()
    sr, ch, got = decode_wav(bytes(out[0]["media"]))
    assert (sr, ch) == (8000, 2)
    assert len(got) // ch == 4
    # nearest-frame pick: frame i of the output is source frame 2i
    for i in range(4):
        assert tuple(got[i * 2 : i * 2 + 2]) == frames[i * 8 // 4]


def test_media_strict_coverage_matches_oracle(spark, sf_correct):
    """The strict decode-coverage card (staged for the round-11
    registration) vs the construction-rule oracle: only WAV payloads
    are complete streams, so audio is 'decoded' and the header-only
    PNG/JPEG containers are 'truncated-stream', with counts by
    doc_id % 3."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_strict_coverage,
    )

    from .oracle import assert_matches_oracle

    sql = """
    WITH k AS (
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               CASE WHEN doc_id % 3 = 1 THEN 'decoded'
                    ELSE 'truncated-stream' END AS status
        FROM documents)
    SELECT media_type, status, CAST(count(*) AS BIGINT) AS n_media,
           CAST(1000000 AS BIGINT) AS share_ppm
    FROM k GROUP BY media_type, status
    """
    assert_matches_oracle(
        media_strict_coverage(spark, sf_correct), sql, sf_correct
    )


def test_media_strict_coverage_classifies_all_statuses(spark):
    """The injectable core produces all three statuses on synthetic
    media: a real encoded JPEG/PNG/WAV -> decoded; a progressive JPEG /
    unknown container -> unsupported-codec; header-only streams ->
    truncated-stream. share_ppm splits exactly within a modality."""
    import struct

    import numpy as np

    from bigdata_infra_cs489_spark.operators.jpeg import encode_jpeg
    from bigdata_infra_cs489_spark.operators.multimodal import (
        encode_png,
        encode_wav,
        media_strict_coverage_core,
    )

    rng = np.random.default_rng(23)
    real_jpg = encode_jpeg(8, 8, rng.integers(0, 256, 64, dtype=np.uint8).tobytes(), 1)
    real_png = encode_png(4, 4, bytes(range(48)), 3)
    real_wav = encode_wav(8000, 1, struct.pack("<4h", 1, -2, 3, -4))
    progressive = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
                   + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    header_only = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
                   + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
                   + b"\x12\x34")
    unknown = b"GIF89a....."
    # mid-stream truncations that used to escape as zlib.error /
    # struct.error before the decode normalization (round-11 advisory):
    # a PNG cut inside the IDAT body and a WAV cut inside the fmt body
    # must classify as truncated-stream, not crash the Spark stage.
    idat_off = real_png.index(b"IDAT")
    truncated_png = real_png[: idat_off + 7]
    truncated_wav = real_wav[:20]
    rows = [
        (bytearray(real_jpg), "video"),
        (bytearray(progressive), "video"),
        (bytearray(header_only), "video"),
        (bytearray(unknown), "video"),
        (bytearray(real_png), "image"),
        (bytearray(truncated_png), "image"),
        (bytearray(real_wav), "audio"),
        (bytearray(truncated_wav), "audio"),
    ]
    df = spark.createDataFrame(rows, "media binary, mt string")
    got = {
        (r["media_type"], r["status"]): (r["n_media"], r["share_ppm"])
        for r in media_strict_coverage_core(df).collect()
    }
    assert got[("video", "decoded")] == (1, 250000)
    assert got[("video", "unsupported-codec")] == (2, 500000)
    assert got[("video", "truncated-stream")] == (1, 250000)
    assert got[("image", "decoded")] == (1, 500000)
    assert got[("image", "truncated-stream")] == (1, 500000)
    assert got[("audio", "decoded")] == (1, 500000)
    assert got[("audio", "truncated-stream")] == (1, 500000)


def test_parse_media_header_fill_run_tail_is_valueerror():
    """A JPEG whose header area ends inside a 0xFF fill run (round-12
    advisory): the fill-consume walk used to step to the last byte and
    index past the end — a raw IndexError escaping decode_media
    (strict=False). The contract is ValueError for any malformed
    header, same normalization as decode_jpeg/decode_png/decode_wav."""
    import pytest

    from bigdata_infra_cs489_spark.operators.multimodal import parse_media_header

    for tail in (b"", b"\xff", b"\xff\xff", b"\xff\xff\xff"):
        with pytest.raises(ValueError):
            parse_media_header(b"\xff\xd8\xff\xff" + tail)
    # truncated PNG/WAV header areas normalize the same way
    from bigdata_infra_cs489_spark.operators.multimodal import _PNG_SIG

    with pytest.raises(ValueError):
        parse_media_header(bytes(_PNG_SIG) + b"\x00\x00")
    with pytest.raises(ValueError):
        parse_media_header(b"RIFF\x04\x00\x00\x00WAVEfmt")


# --- media_roundtrip_coverage (registered in the round-13 rotation) ----------


def _roundtrip_sql() -> str:
    """Registered in the round-13 rotation — single-sourced from the
    catalog so this test and the driver check the identical twin."""
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["media_roundtrip_coverage"]


def test_media_roundtrip_matches_oracle(spark, sf_correct):
    """The oracle derives every status from the doc_id construction
    rules alone, so the Spark side's REAL encode->decode round trips
    (entropy-coded JPEG, zlib PNG, PCM WAV) must land each payload in
    exactly the predicted class — any codec or error-class drift breaks
    the value hash."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_roundtrip_coverage,
    )

    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        media_roundtrip_coverage(spark, sf_correct), _roundtrip_sql(), sf_correct
    )


def test_media_roundtrip_has_decoded_rows_per_modality(spark, sf_correct):
    """The card's reason to exist (round-10/11 verdicts): non-vacuous
    'decoded' evidence for image AND audio AND video, i.e. the full
    sample-level decoders actually succeed on complete engine-encoded
    streams — plus the other two legs present so the card never goes
    vacuously green."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        media_roundtrip_coverage,
    )

    rows = media_roundtrip_coverage(spark, sf_correct).collect()
    got = {(r.media_type, r.status): r.n_media for r in rows}
    for mt in ("image", "audio", "video"):
        assert got.get((mt, "decoded"), 0) > 0, f"no decoded rows for {mt}"
        assert got.get((mt, "truncated-stream"), 0) > 0
        assert got.get((mt, "unsupported-codec"), 0) > 0
    for r in rows:
        assert 0 < r.share_ppm <= 1000000
