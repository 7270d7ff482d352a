"""Multimodal plumbing tests: schema/batch/partitioning of the decode
pipelines is real; the codec itself is the documented deterministic
fake (real libs absent from this image)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deeplake_spark.io import load_table
from deeplake_spark.operators.multimodal import (
    decode_images,
    image_stats,
    resize_images,
    sample_video_frames,
    with_payload_from_text,
)


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    return with_payload_from_text(d).select("doc_id", "image").cache()


def test_decode_schema_and_determinism(spark, payloads):
    out = decode_images(payloads)
    assert out.columns == ["doc_id", "pixels", "shape"]
    rows = {r.doc_id: r for r in out.collect()}
    assert all(r.shape == [16, 16, 3] for r in rows.values())
    # determinism: same payload → same pixels across runs
    again = {r.doc_id: r for r in decode_images(payloads).collect()}
    some = next(iter(rows))
    assert rows[some].pixels == again[some].pixels


def test_strict_raises_without_codec(spark, payloads):
    with pytest.raises(Exception) as ei:
        decode_images(payloads, compression="jpg", strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_image_stats(spark, payloads):
    out = image_stats(payloads).collect()
    assert len(out) == 20
    for r in out:
        assert r.height == 16 and r.width == 16 and r.channels == 3
        assert 0 <= r.mean <= 255 and r.std > 0


def test_resize(spark, payloads):
    out = resize_images(payloads, 8, 4).collect()
    assert all(r.shape == [8, 4, 3] for r in out)


def test_video_frame_sampling(spark, payloads):
    vid = payloads.withColumnRenamed("image", "video")
    out = sample_video_frames(vid, every_n=2, payload_col="video")
    rows = out.collect()
    # 20 clips × 4 sampled frames (0,2,4,6 of 8)
    assert len(rows) == 80
    assert sorted({r.frame_index for r in rows}) == [0, 2, 4, 6]


def test_audio_features(spark, payloads):
    from deeplake_spark.operators.multimodal import audio_features

    aud = payloads.withColumnRenamed("image", "audio")
    out = audio_features(aud).collect()
    assert len(out) == 20
    for r in out:
        assert r.n_samples == 1024 and 0 < r.rms < 1 and 0 < r.peak <= 1


def test_fetch_links_local_files(spark, tmp_path):
    from deeplake_spark.operators.multimodal import fetch_links

    f1 = tmp_path / "a.bin"
    f1.write_bytes(b"payload-a")
    rows = [(1, str(f1)), (2, "http://example.com/x.png"), (3, None)]
    df = spark.createDataFrame(rows, "id: int, image: string")
    got = {r.id: (bytes(r.payload) if r.payload is not None else None)
           for r in fetch_links(df).collect()}
    assert got[1] == b"payload-a"
    assert got[2] is None and got[3] is None  # remote gated, null passthrough
