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
    else:  # JPEG SOI + SOF0
        hdr = (
            bytes.fromhex("FFD8FFC0000B08")
            + struct.pack(">HH", hh, w)
            + bytes.fromhex("01011100")
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


def test_decode_strict_raises_without_codec(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.multimodal import (
        HAVE_IMAGE_CODEC,
        decode_media,
        media_table,
    )

    df = media_table(spark, sf_smoke).limit(4)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        decode_media(df, strict=True).collect()


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


def test_resize_strict_raises_without_codec(spark, sf_smoke):
    import pytest

    from bigdata_infra_cs489_spark.operators.multimodal import (
        HAVE_IMAGE_CODEC,
        media_table,
        resize_media,
    )

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        resize_media(media_table(spark, sf_smoke), strict=True).collect()
