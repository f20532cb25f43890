"""Multimodal plumbing: binary columns + Arrow-batched kernels (stubbed
codecs, real distributed plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", ("image", "png", 64, 64, None)),
        (2, b"\x89PNG-fake-bytes-22", ("image", "png", 128, 128, None)),
        (3, b"RIFF-fake-wav", ("audio", "wav", None, None, 3500)),
        (4, b"\x00\x00ftyp-fake-mp4", ("video", "mp4", 640, 480, 4200)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(r["features"]) == FEATURE_DIM for r in rows.values())
    assert all(0.0 <= x < 1.0 for r in rows.values() for x in r["features"])
    # deterministic across runs (hash-derived, not random)
    again = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    assert all(again[k] == rows[k]["features"] for k in rows)
    assert rows[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")


def test_extract_features_real_path_raises_on_undecodable(media):
    # the fixture payloads are fake bytes, not real containers — the real
    # decode path must surface that, not invent features
    with pytest.raises(Exception, match="unrecognized|codec"):
        extract_features(media, fake=False).collect()


def test_extract_features_real_decode_end_to_end(spark):
    """Real stdlib decode (operators/codecs.py) through the distributed
    kernel: PNG + BMP + WAV payloads, real pixel/sample stats out; a JPEG
    nulls out (not crashes) under on_error='null'."""
    import numpy as np

    from datapump_spark.operators import codecs

    img = np.full((4, 6, 3), 100, np.uint8)
    img[:, :, 1] = 20  # mean = (100+20+100)/3 = 73.333...
    wav = codecs.encode_wav(np.zeros(800), 8000)
    rows = [
        (1, codecs.encode_png(img), ("image", "png", 6, 4, None)),
        (2, codecs.encode_bmp(img), ("image", "bmp", 6, 4, None)),
        (3, wav, ("audio", "wav", None, None, 100)),
        (4, b"\xff\xd8\xff\xe0fake-jpeg", ("image", "jpeg", 1, 1, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)
    with pytest.raises(Exception, match="JPEG"):
        extract_features(media, fake=False).collect()
    out = {r["media_id"]: r["features"]
           for r in extract_features(media, fake=False, on_error="null").collect()}
    for mid in (1, 2):  # [w, h, c, mean, std, mean_r, mean_g, mean_b]
        assert out[mid][:3] == [6.0, 4.0, 3.0]
        assert abs(out[mid][3] - 220 / 3) < 1e-9
        assert out[mid][5:] == [100.0, 20.0, 100.0]
    assert out[3][:4] == [800.0, 1.0, 8000.0, 100.0]  # frames, ch, sr, ms
    assert out[4] is None  # JPEG → null, job survives


def test_resize_images_real_path(spark):
    import numpy as np

    from datapump_spark.operators import codecs

    grad = np.arange(16, dtype=np.uint8).reshape(4, 4, 1).repeat(3, axis=2)
    rows = [(1, codecs.encode_png(grad), ("image", "png", 4, 4, None)),
            (2, codecs.encode_bmp(grad), ("image", "bmp", 4, 4, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, 2, 2, fake=False).collect()}
    for mid in (1, 2):
        dec = codecs.decode_png(bytes(out[mid]["payload"]))  # always PNG out
        assert dec.shape == (2, 2, 3)
        assert dec[:, :, 0].tolist() == [[5, 7], [13, 15]]  # nearest pins


def test_resize_passthrough_stamps_dims(media):
    out = resize_images(media, 32, 32, fake=True).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)


def test_sample_frames_from_metadata(media):
    frames = sample_frames(media, every_ms=1000, fake=True)
    got = frames.where(F.col("media_id") == 4).collect()
    # 4200 ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(got, key=lambda r: r["frame_idx"])] == [0, 1000, 2000, 3000]


def test_media_stats(media):
    stats = {(r["kind"], r["format"]): r for r in media_stats(media).collect()}
    assert stats[("image", "png")]["n"] == 2
    assert stats[("video", "mp4")]["avg_duration_ms"] == 4200.0


def test_image_near_dup_perceptual(spark):
    """dHash near-dedup: a re-encoded noisy copy pairs with its original
    at small hamming; structurally different images don't pair; an
    undecodable payload yields a null hash (dropped from the index)."""
    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.operators.multimodal import (
        image_dhash,
        image_near_dup,
    )

    rng = np.random.default_rng(7)
    ramp = np.tile(np.linspace(10, 245, 64).astype(np.uint8), (48, 1))
    base = np.stack([ramp, ramp, ramp], axis=2)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-3, 4, base.shape), 0, 255) \
        .astype(np.uint8)
    other = rng.integers(0, 256, base.shape).astype(np.uint8)  # texture
    rows = [(1, bytearray(codecs.encode_png(base))),
            (2, bytearray(codecs.encode_png(noisy))),
            (3, bytearray(codecs.encode_bmp(other))),
            (4, bytearray(b"\xff\xd8\xffJPEGJPEG"))]          # undecodable
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    hashes = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert hashes[4] is None
    assert hashes[1] is not None and hashes[1] != hashes[3]

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_near_dup(df, max_hamming=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs

    with __import__("pytest").raises(Exception):
        image_dhash(df, on_error="raise").collect()


def test_audio_near_dup_envelope(spark):
    """Envelope fingerprints: a volume-scaled, lightly-noised copy pairs
    with its original; a different envelope doesn't; non-WAV → null."""
    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup,
    )

    rng = np.random.default_rng(3)
    t = np.arange(13_000)
    env = 0.2 + 0.8 * np.abs(np.sin(t / 900.0))          # slow envelope
    base = (np.sin(t / 3.0) * env * 0.4)[:, None]        # floats in [-1,1]
    scaled = base * 0.5 + rng.uniform(-0.002, 0.002, base.shape)
    other_env = 0.05 + 0.95 * (t / len(t))               # monotone ramp
    other = (np.sin(t / 3.0) * other_env * 0.4)[:, None]
    rows = [(1, bytearray(codecs.encode_wav(base, 8000))),
            (2, bytearray(codecs.encode_wav(scaled, 8000))),
            (3, bytearray(codecs.encode_wav(other, 8000))),
            (4, bytearray(b"not audio at all"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    fps = {r.media_id: r.afp for r in audio_fingerprint(df).collect()}
    assert fps[4] is None and fps[1] is not None

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in audio_near_dup(df, max_hamming=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs


# slow: every component is gated in-default (q_sniff_media /
# q_image_decode oracles, image_near_dup + quarantine routing in
# this file and test_streaming_media); this adds only the one-call
# composition
@pytest.mark.slow
def test_media_corpus_one_call(spark, tmp_path):
    """Directory in, curated streams out: perceptual dup loses to the
    lower id, mislabeled and undecodable files route to quarantine with
    reasons, WAV passes through untouched by the image dedup."""
    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.recipes import media_corpus

    d = tmp_path / "media"
    d.mkdir()
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-2, 3, base.shape), 0, 255) \
        .astype(np.uint8)
    other = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    (d / "a_base.png").write_bytes(codecs.encode_png(base))
    (d / "b_copy.png").write_bytes(codecs.encode_png(noisy))
    (d / "c_other.png").write_bytes(codecs.encode_png(other))
    (d / "tone.wav").write_bytes(
        codecs.encode_wav(np.sin(np.arange(800) / 5.0) * 0.4, 8000))
    (d / "renamed.bmp").write_bytes(codecs.encode_png(base))   # mislabeled
    (d / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\njunk")   # undecodable

    out = media_corpus(spark, str(d))
    media = {r.path.rsplit("/", 1)[-1]: r for r in out["media"].collect()}
    quar = {r.path.rsplit("/", 1)[-1]: r.reason
            for r in out["quarantine"].collect()}
    assert quar == {"renamed.bmp": "mislabeled", "broken.png": "undecodable"}
    # base/copy collapse to one survivor; other + wav always survive
    assert "c_other.png" in media and "tone.wav" in media
    assert len({"a_base.png", "b_copy.png"} & set(media)) == 1
    assert out["dup_pairs"].count() == 1


def test_extract_exif_kernel(spark):
    """EXIF provenance through the Arrow kernel (round 8): tagged
    JPEGs yield orientation/camera/timestamps, untagged and non-JPEG
    payloads yield nulls without erroring."""
    import numpy as np

    from datapump_spark.operators.jpeg import encode_jpeg
    from datapump_spark.operators.mediasniff import (encode_exif_app1,
                                                     inject_exif)
    from datapump_spark.operators.multimodal import extract_exif

    tags = {"make": "SynthCam", "model": "SC-1000", "orientation": 6,
            "datetime": "2024:05:01 10:11:12",
            "datetime_original": "2024:04:30 09:00:01",
            "pixel_x": 64, "pixel_y": 48}
    plain = encode_jpeg(np.full((8, 8), 7, np.uint8))
    rows = [(1, bytearray(inject_exif(plain, encode_exif_app1(tags)))),
            (2, bytearray(inject_exif(plain,
                                      encode_exif_app1(tags, "big")))),
            (3, bytearray(plain)),
            (4, bytearray(b"not media"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_exif(df).collect()}
    for mid in (1, 2):
        assert out[mid]["orientation"] == 6
        assert out[mid]["make"] == "SynthCam"
        assert out[mid]["datetime_original"] == "2024:04:30 09:00:01"
        assert (out[mid]["pixel_x"], out[mid]["pixel_y"]) == (64, 48)
    assert out[3]["orientation"] is None and out[4]["make"] is None
