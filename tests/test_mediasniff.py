"""Media header sniffing: REAL byte-level parsing (no codecs), expr path
pinned equal to the pandas kernel, hand-built valid files as ground truth."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.mediasniff import (
    SNIFF_SCHEMA,
    parse_media_header,
    sniff_media,
    verify_media_format,
)
from datapump_spark.operators.multimodal import MEDIA_SCHEMA


# ---------------------------------------------------------------------------
# Minimal *valid* file builders (stdlib only)
# ---------------------------------------------------------------------------

def make_png(w: int, h: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))  # filter 0 rows
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_jpeg(w: int, h: int) -> bytes:
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    out = b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # a DHT segment before SOF exercises the scan loop
    dht = b"\x00" + b"\x00" * 16
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    out += b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    return out + b"\xff\xd9"  # EOI


def make_gif(w: int, h: int) -> bytes:
    return (b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
            + b"\x3b")


def make_bmp(w: int, h: int, top_down: bool = False) -> bytes:
    row = ((w * 3 + 3) // 4) * 4
    pix = b"\x00" * (row * h)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def make_wav(sr: int, ch: int, n_samples: int, canonical: bool = True) -> bytes:
    data = b"\x00\x00" * ch * n_samples
    byte_rate = sr * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if not canonical:
        # a LIST chunk between fmt and data breaks the fixed-offset layout
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_flac(sr: int, ch: int, total_samples: int) -> bytes:
    # STREAMINFO: min/max blocksize, min/max framesize, then the packed
    # 20-bit sr / 3-bit ch-1 / 5-bit bps-1 / 36-bit total field.
    packed = (sr << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | total_samples
    info = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
            + packed.to_bytes(8, "big") + b"\x00" * 16)
    return b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + info


FILES = {
    1: (make_png(640, 480), "png", 640, 480),
    2: (make_jpeg(1920, 1080), "jpeg", 1920, 1080),
    3: (make_gif(320, 200), "gif", 320, 200),
    4: (make_bmp(800, 600), "bmp", 800, 600),
    5: (make_bmp(64, 32, top_down=True), "bmp", 64, 32),
}
AUDIO = {
    6: (make_wav(44100, 2, 44100), "wav", 44100, 2, 1000),
    7: (make_wav(16000, 1, 8000, canonical=False), "wav", 16000, 1, 500),
    8: (make_flac(48000, 2, 96000), "flac", 48000, 2, 2000),
}
OTHER = {
    9: (b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32, "mp4"),
    10: (b"OggS" + b"\x00" * 20, "ogg"),
    11: (b"ID3\x04\x00" + b"\x00" * 20, "mp3"),
    12: (b"\x1aE\xdf\xa3" + b"\x00" * 8, "mkv"),
    13: (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "webp"),
    14: (b"utter garbage, not a media file at all", None),
    15: (b"\x89PN", None),  # truncated magic
}


def _media_df(spark):
    rows = []
    for mid, (payload, *_rest) in {**FILES, **AUDIO, **OTHER}.items():
        rows.append((mid, bytearray(payload),
                     ("image", "png", None, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


# ---------------------------------------------------------------------------
# Pure-parser ground truth
# ---------------------------------------------------------------------------

def test_parse_images():
    for mid, (payload, fmt, w, h) in FILES.items():
        p = parse_media_header(payload)
        assert (p["format"], p["width"], p["height"]) == (fmt, w, h), mid
        assert p["kind"] == "image"


def test_parse_audio():
    for mid, (payload, fmt, sr, ch, dur) in AUDIO.items():
        p = parse_media_header(payload)
        assert p["format"] == fmt and p["kind"] == "audio", mid
        assert (p["sample_rate"], p["channels"]) == (sr, ch), mid
        assert p["duration_ms"] == dur, mid


def test_parse_other_formats_and_garbage():
    for mid, (payload, fmt) in OTHER.items():
        p = parse_media_header(payload)
        assert p["format"] == fmt, mid
        if fmt is None:
            assert p["kind"] == "blob"
    # corrupt-but-magic'd payloads degrade to Nones, never raise
    p = parse_media_header(b"\x89PNG\r\n\x1a\n" + b"\x01")
    assert p["format"] is None or p["width"] is None


# ---------------------------------------------------------------------------
# Distributed paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    return _media_df(spark)


def test_sniff_expr_matches_ground_truth(media):
    got = {r["media_id"]: r for r in sniff_media(media).collect()}
    for mid, (payload, fmt, w, h) in FILES.items():
        r = got[mid]
        assert r["format"] == fmt
        if fmt == "jpeg":
            assert r["width"] is None  # expr path can't scan segments
        else:
            assert (r["width"], r["height"]) == (w, h)
    # canonical wav: full fields; non-canonical: format only, no lies
    assert got[6]["sample_rate"] == 44100 and got[6]["duration_ms"] == 1000
    assert got[7]["format"] == "wav" and got[7]["sample_rate"] is None
    assert got[8]["sample_rate"] == 48000 and got[8]["channels"] == 2
    assert got[14]["format"] is None and got[14]["kind"] == "blob"
    assert all(r["n_bytes"] > 0 for r in got.values())


def test_sniff_pandas_full_fidelity(media):
    got = {r["media_id"]: r for r in
           sniff_media(media, strategy="pandas").collect()}
    assert (got[2]["width"], got[2]["height"]) == (1920, 1080)  # JPEG dims
    assert got[7]["sample_rate"] == 16000  # chunk walk
    assert got[7]["duration_ms"] == 500


def test_expr_equals_pandas_on_shared_domain(media):
    """The codegen path and the Python kernel agree wherever both parse
    (everything except JPEG dims and non-canonical WAV fields)."""
    e = {r["media_id"]: r for r in sniff_media(media).collect()}
    p = {r["media_id"]: r for r in
         sniff_media(media, strategy="pandas").collect()}
    assert set(e) == set(p)
    for mid in e:
        for f in [x.name for x in SNIFF_SCHEMA.fields]:
            if e[mid][f] is None:
                continue  # expr abstains where it can't parse — never lies
            assert e[mid][f] == p[mid][f], (mid, f)


def test_expr_path_is_codegen_only(media):
    plan = sniff_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan


def test_verify_media_format_flags_mislabeled(media):
    # fixture claims every row is png; only media_id=1 actually is
    bad = {r["media_id"]: r for r in verify_media_format(media).collect()}
    assert 1 not in bad
    assert bad[2]["sniffed"] == "jpeg" and bad[2]["claimed"] == "png"
    assert bad[14]["sniffed"] is None  # garbage claimed as png → flagged
    assert len(bad) == len(FILES) + len(AUDIO) + len(OTHER) - 1


@pytest.mark.slow  # redundancy: q_sniff_av is driver-gated per
# round against the DuckDB oracle; this pytest twin re-checks the
# same ground truth and is full-tier-only (r12 tier move)
def test_q_sniff_media_ground_truth(spark):
    """The bench query's sniffed stats must equal values derivable from
    doc_id (the payload builder and the sniffer are independent codepaths:
    hex/unhex assembly vs substring/conv parsing)."""
    from datapump_spark.queries import _media_real_headers, q_sniff_media

    sf_dir = "/root/testdata/sf0.001"
    got = {r["format"]: r for r in q_sniff_media(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "n_chars").collect()
    gif_ids = [r["doc_id"] for r in docs if r["doc_id"] % 3 == 0]
    wav = [r for r in docs if r["doc_id"] % 3 == 1]
    assert got["gif"]["n"] == len(gif_ids)
    assert got["gif"]["kind"] == "image"
    exp_w = sum(i % 1024 + 1 for i in gif_ids) / len(gif_ids)
    assert abs(got["gif"]["avg_w"] - exp_w) < 2e-6  # avg rounded to 6dp
    assert got["wav"]["n"] == len(wav)
    assert got["wav"]["avg_sr"] == 16000.0
    exp_dur = sum(r["n_chars"] * 1000 // 32000 for r in wav) / len(wav)
    assert abs(got["wav"]["avg_dur_ms"] - exp_dur) < 2e-6
    assert got["mp4"]["kind"] == "video"
    # pandas strategy agrees on the same synthesized payloads
    from datapump_spark.operators.mediasniff import sniff_media
    m = _media_real_headers(spark, sf_dir)
    e = {r["media_id"]: r for r in sniff_media(m).collect()}
    p = {r["media_id"]: r for r in sniff_media(m, strategy="pandas").collect()}
    assert e == p


def test_null_payload_never_crashes_either_path(spark):
    rows = [(1, None, ("image", "png", None, None, None)),
            (2, bytearray(make_gif(3, 4)), ("image", "gif", None, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for strat in ("expr", "pandas"):
        got = {r["media_id"]: r for r in
               sniff_media(df, strategy=strat).collect()}
        assert got[1]["format"] is None and got[1]["kind"] == "blob"
        assert got[1]["n_bytes"] is None
        assert got[2]["format"] == "gif"


def test_truncated_headers_abstain_in_both_paths(spark):
    """A valid magic with a truncated header must degrade to format=None
    (pandas) AND format=None (expr) — never a claimed format with
    conv-of-partial-bytes dimensions."""
    rows = [(1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 10),  # png cut before IHDR end
            (2, b"GIF89a\x10"),                          # gif cut mid-dims
            (3, b"fLaC" + b"\x00" * 8),                  # flac cut mid-info
            (4, b"RIFF\x00\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00")]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "media_id long, payload binary")
    e = {r["media_id"]: r for r in sniff_media(df).collect()}
    p = {r["media_id"]: r for r in
         sniff_media(df, strategy="pandas").collect()}
    for mid in (1, 2, 3):
        assert e[mid]["format"] is None, (mid, e[mid])
        assert p[mid]["format"] is None, (mid, p[mid])
    # wav with truncated fmt chunk: format detected, fields abstain
    assert e[4]["format"] == p[4]["format"] == "wav"
    assert p[4]["sample_rate"] is None and p[4]["channels"] is None
    assert e[4]["sample_rate"] is None


# ---------------------------------------------------------------------------
# MP3 frame-header walk (round 8): Layer III sample rate / channels /
# duration (Xing frame count when present, CBR estimate otherwise).
# ---------------------------------------------------------------------------

def test_mp3_cbr_duration_estimate():
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])   # V1 L3, 128 kbps, 44.1 kHz
    mp3 = (hdr + b"\x00" * 413) * 10
    p = parse_media_header(mp3)
    assert p["format"] == "mp3" and p["kind"] == "audio"
    assert (p["sample_rate"], p["channels"]) == (44100, 2)
    assert p["duration_ms"] == len(mp3) * 8000 // 128000


def test_mp3_xing_frame_count_wins():
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    xing = b"Xing" + (1).to_bytes(4, "big") + (100).to_bytes(4, "big")
    p = parse_media_header(hdr + b"\x00" * 32 + xing + b"\x00" * 1200)
    assert p["duration_ms"] == 100 * 1152 * 1000 // 44100


def test_mp3_id3_tag_skipped_and_bare_tag_abstains():
    hdr = bytes([0xFF, 0xF3, 0x90, 0xC0])   # V2 L3, 22.05 kHz, mono
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    p = parse_media_header(id3 + hdr + b"\x00" * 200)
    assert (p["sample_rate"], p["channels"]) == (22050, 1)
    assert p["duration_ms"] is not None
    # a tag with no audio frame yields Nones, never a guess
    p = parse_media_header(b"ID3\x04\x00" + b"\x00" * 20)
    assert p["format"] == "mp3" and p["sample_rate"] is None


# ---------------------------------------------------------------------------
# Video container walks (round 8): MP4 box arithmetic, Matroska EBML —
# duration and dimensions without any codec.
# ---------------------------------------------------------------------------

def _mp4_box(typ, payload):
    import struct
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def test_mp4_moov_dims_and_duration():
    import struct
    mvhd = _mp4_box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                    + struct.pack(">II", 1000, 12500) + b"\x00" * 80)
    tkhd_v = (b"\x00\x00\x00\x07" + b"\x00" * 68
              + struct.pack(">HHHH", 640, 0, 360, 0))
    tkhd_a = b"\x00\x00\x00\x07" + b"\x00" * 68 + b"\x00" * 8
    moov = _mp4_box(b"moov", mvhd
                    + _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd_a))
                    + _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd_v)))
    p = parse_media_header(_mp4_box(b"ftyp", b"isom") + moov)
    assert p["format"] == "mp4" and p["kind"] == "video"
    assert (p["width"], p["height"]) == (640, 360)   # audio track's 0x0 skipped
    assert p["duration_ms"] == 12500
    # version-1 mvhd (64-bit duration)
    import struct as s2
    mvhd1 = _mp4_box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                     + s2.pack(">I", 600) + s2.pack(">Q", 3000) + b"\x00" * 80)
    p = parse_media_header(_mp4_box(b"ftyp", b"x") + _mp4_box(b"moov", mvhd1))
    assert p["duration_ms"] == 5000
    # bare ftyp abstains
    p = parse_media_header(_mp4_box(b"ftyp", b"isom"))
    assert p["format"] == "mp4" and p["width"] is None


def _ebml(eid, payload):
    n = (eid.bit_length() + 7) // 8
    out = eid.to_bytes(n, "big")
    for ln in range(1, 9):
        if len(payload) < (1 << (7 * ln)) - 1:
            out += (((1 << (8 - ln)) << (8 * (ln - 1)))
                    | len(payload)).to_bytes(ln, "big")
            break
    return out + payload


def test_mkv_segment_walk():
    import struct
    info = _ebml(0x1549A966,
                 _ebml(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                 + _ebml(0x4489, struct.pack(">d", 42_000.0)))
    video = _ebml(0xE0, _ebml(0xB0, (1280).to_bytes(2, "big"))
                  + _ebml(0xBA, (720).to_bytes(2, "big")))
    tracks = _ebml(0x1654AE6B, _ebml(0xAE, video))
    mkv = (_ebml(0x1A45DFA3, _ebml(0x4282, b"matroska"))
           + _ebml(0x18538067, info + tracks))
    p = parse_media_header(mkv)
    assert p["format"] == "mkv" and p["kind"] == "video"
    assert (p["width"], p["height"]) == (1280, 720)
    assert p["duration_ms"] == 42000
    # bare magic abstains, never guesses
    p = parse_media_header(b"\x1aE\xdf\xa3" + b"\x00" * 8)
    assert p["format"] == "mkv" and p["width"] is None


def test_ogg_vorbis_and_opus_duration():
    """Ogg (round 8): rate/channels from the first page's codec ID
    header; duration from the last page's granule position (Opus
    granules at 48 kHz minus pre-skip)."""
    import struct

    def page(htype, granule, serial, seq, segments):
        return (b"OggS\x00" + bytes([htype]) + struct.pack("<q", granule)
                + struct.pack("<II", serial, seq) + b"\x00" * 4
                + bytes([len(segments)])
                + bytes(len(s) for s in segments) + b"".join(segments))

    vid = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
           + struct.pack("<I", 44100) + b"\x00" * 9)
    p = parse_media_header(page(2, 0, 7, 0, [vid])
                           + page(4, 44100 * 3, 7, 1, [b"\x00" * 10]))
    assert (p["sample_rate"], p["channels"], p["duration_ms"]) == \
        (44100, 2, 3000)

    oid = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
           + struct.pack("<I", 16000) + b"\x00" * 3)
    p = parse_media_header(page(2, 0, 9, 0, [oid])
                           + page(4, 48000 * 2 + 312, 9, 1, [b"\x00" * 4]))
    assert (p["sample_rate"], p["channels"], p["duration_ms"]) == \
        (16000, 1, 2000)

    p = parse_media_header(b"OggS" + b"\x00" * 30)
    assert p["format"] == "ogg" and p["duration_ms"] is None


def test_truncated_v1_mvhd_abstains_not_garbage():
    """ADVICE r8: a version-1 mvhd truncated to 28-31 bytes used to
    read the u64 duration from a short slice (silently wrong value);
    it must abstain instead — and never fall into the v0 layout."""
    import struct
    # v1 header truncated right after the timescale (28 bytes < 32)
    mvhd = _mp4_box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                    + struct.pack(">I", 600) + b"\x00" * 4)
    p = parse_media_header(_mp4_box(b"ftyp", b"x")
                           + _mp4_box(b"moov", mvhd))
    assert p["format"] == "mp4" and p["duration_ms"] is None


def test_truncated_opushead_falls_back_to_48k():
    """ADVICE r8: a 14-byte OpusHead packet used to read the sample
    rate from a 2-byte slice; the short field must fall back to the
    48 kHz granule rate (channels/pre-skip still parse)."""
    import struct

    def page(htype, granule, serial, seq, segments):
        return (b"OggS\x00" + bytes([htype]) + struct.pack("<q", granule)
                + struct.pack("<II", serial, seq) + b"\x00" * 4
                + bytes([len(segments)])
                + bytes(len(s) for s in segments) + b"".join(segments))

    oid = b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0) + b"\x00\x01"
    assert len(oid) == 14
    p = parse_media_header(page(2, 0, 9, 0, [oid])
                           + page(4, 48000, 9, 1, [b"\x00" * 4]))
    assert (p["sample_rate"], p["channels"], p["duration_ms"]) == \
        (48000, 2, 1000)


def test_parse_exif_skips_fill_bytes():
    """ADVICE r8: T.81 B.1.1.2 allows any number of 0xFF fill bytes
    before a marker; parse_exif's APP1 walk must skip them exactly as
    decode_jpeg does, not read a derailed segment length."""
    from datapump_spark.operators.mediasniff import parse_exif
    tiff = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")                    # 1 IFD entry
            + (0x0112).to_bytes(2, "little")               # orientation
            + (3).to_bytes(2, "little") + (1).to_bytes(4, "little")
            + (6).to_bytes(2, "little") + b"\x00\x00"
            + (0).to_bytes(4, "little"))
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    jpg = b"\xff\xd8" + b"\xff\xff\xff" + seg + b"\xff\xd9"
    assert parse_exif(jpg).get("orientation") == 6


def test_mp3_vbri_header_frame_count():
    """Foreign-encoder fixture (r9): the Fraunhofer VBRI header sits
    at FIXED offset 32 after the frame header (not after the side
    info like Xing); its big-endian frame count wins over the CBR
    estimate."""
    import struct
    # MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo, no CRC
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    vbri = (b"VBRI" + struct.pack(">HHH", 1, 0, 80)
            + struct.pack(">II", 500_000, 1000))   # bytes, frames
    frame = hdr + b"\x00" * 32 + vbri + b"\x00" * 100
    p = parse_media_header(frame)
    assert p["format"] == "mp3"
    # 1000 frames x 1152 samples / 44100 Hz = 26122 ms
    assert p["duration_ms"] == 1000 * 1152 * 1000 // 44100
    # truncated VBRI falls back to the CBR estimate, never a bogus read
    short = hdr + b"\x00" * 32 + b"VBRI" + b"\x00" * 6
    p = parse_media_header(short)
    assert p["duration_ms"] == len(short) * 8000 // 128000
