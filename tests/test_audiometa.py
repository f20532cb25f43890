"""Audio tag extraction gates (operators/audiometa.py, r11): ID3v2.3/
v2.4 across all four text encodings, FLAC VORBIS_COMMENT splices,
Ogg Vorbis comment headers, WAV LIST/INFO, foreign-construct
tolerance, and the Spark kernel."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datapump_spark.operators.audiometa import (add_flac_comments,
                                                encode_id3v2,
                                                extract_audio_tags,
                                                parse_audio_tags)

TAGS = {"title": "Song — ünïcödé", "artist": "Band", "album": "LP",
        "date": "2024", "track": "7", "genre": "ambient"}


def _tone():
    t = np.arange(1200) / 8000.0
    return 0.3 * np.sin(2 * np.pi * 440 * t)


def test_id3_versions_and_encodings():
    from datapump_spark.operators.mp3 import decode_mp3, encode_mp3
    mp3 = encode_mp3(_tone(), 32000)
    for ver in (3, 4):
        for enc in (0, 1, 2, 3):
            b = encode_id3v2(TAGS, version=ver,
                             encodings={k: enc for k in TAGS}) + mp3
            got = parse_audio_tags(b)
            assert got["format"] == f"id3v2.{ver}", (ver, enc)
            assert got["artist"] == "Band" and got["track"] == "7"
            if enc != 0:                  # latin-1 lossy for '—'
                assert got["title"] == TAGS["title"]
            # the tagged stream still DECODES (ID3 skip intact)
            out, sr = decode_mp3(b)
            assert sr == 32000 and len(out)


def test_id3_foreign_constructs():
    """Unknown frames skipped, compressed frames skipped (not
    garbled), padding terminates the walk."""
    base = encode_id3v2({"title": "keep"}, version=4)
    frames = bytearray(base[10:])
    # unknown frame + a 'compressed' TPE1 + padding
    unk = b"XXXX" + bytes([0, 0, 0, 3]) + b"\x00\x00" + b"abc"
    comp = b"TPE1" + bytes([0, 0, 0, 3]) + b"\x00\x0c" + b"zzz"
    frames = bytearray(unk + comp) + frames + b"\x00" * 16
    total = bytes((len(frames) >> s) & 0x7F for s in (21, 14, 7, 0))
    b = b"ID3\x04\x00\x00" + total + bytes(frames)
    got = parse_audio_tags(b)
    assert got["title"] == "keep" and "artist" not in got


def test_id3v23_compressed_flag_skipped():
    """v2.3 puts compression/encryption in format-flag bits 0x0080/
    0x0040 (v2.4 moved them to 0x0008/0x0004); such frames must be
    skipped, not decoded as garbled text (r12 advice fix)."""
    base = encode_id3v2({"title": "keep"}, version=3)
    comp = b"TPE1" + struct.pack(">I", 3) + b"\x00\x80" + b"zzz"
    enc = b"TALB" + struct.pack(">I", 3) + b"\x00\x40" + b"yyy"
    frames = comp + enc + base[10:]
    total = bytes((len(frames) >> s) & 0x7F for s in (21, 14, 7, 0))
    got = parse_audio_tags(b"ID3\x03\x00\x00" + total + frames)
    assert got["title"] == "keep"
    assert "artist" not in got and "album" not in got


def test_flac_comment_splice_keeps_stream_decodable():
    from datapump_spark.operators.flac import decode_flac, encode_flac
    flac = encode_flac((_tone() * 32767).astype(np.int16), 8000)
    tagged = add_flac_comments(flac, TAGS)
    got = parse_audio_tags(tagged)
    assert got["format"] == "flac" and got["title"] == TAGS["title"]
    assert got["track"] == "7" and got["vendor"] == "datapump-spark"
    samples, sr, _ = decode_flac(tagged)
    assert sr == 8000 and len(samples)
    with pytest.raises(ValueError, match="not a FLAC"):
        add_flac_comments(b"junk", TAGS)


def test_vorbis_and_wav_tags():
    from datapump_spark.operators.vorbis import encode_vorbis
    got = parse_audio_tags(encode_vorbis(_tone(), 8000, comments=TAGS))
    assert got["format"] == "vorbis" and got["album"] == "LP"
    # WAV LIST/INFO hand-built (the WAV twin writes no INFO chunk)
    info = b""
    for cid, val in ((b"INAM", b"wav title"), (b"IART", b"wav artist")):
        v = val + b"\x00"
        info += cid + struct.pack("<I", len(v)) + v + (b"\x00"
                                                       if len(v) & 1
                                                       else b"")
    lst = b"LIST" + struct.pack("<I", 4 + len(info)) + b"INFO" + info
    wav = b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"WAVE" + lst
    got = parse_audio_tags(wav)
    assert got == {"format": "wav", "title": "wav title",
                   "artist": "wav artist"}
    # unknown payloads: advisory empty dict, never a raise
    assert parse_audio_tags(b"garbage") == {}


def test_extract_audio_tags_kernel(spark):
    from datapump_spark.operators.vorbis import encode_vorbis
    rows = [(1, encode_id3v2({"title": "a"}, version=4)),
            (2, encode_vorbis(_tone(), 8000, comments={"title": "b"})),
            (3, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_audio_tags(df).collect()}
    assert got[1]["title"] == "a" and got[1]["format"] == "id3v2.4"
    assert got[2]["title"] == "b" and got[2]["format"] == "vorbis"
    assert got[3]["format"] is None


def test_ogg_flac_metadata_packet():
    """r11: FLAC-in-Ogg comment headers (a raw VORBIS_COMMENT block
    as an Ogg metadata packet) parse, and the tagged stream still
    decodes losslessly."""
    from datapump_spark.operators.vorbis import (decode_ogg_flac,
                                                 encode_ogg_flac)
    x = (_tone() * 32767).astype(np.int16)
    b = encode_ogg_flac(x, 8000, comments={"title": "oggflac song",
                                           "track": "3"})
    got = parse_audio_tags(b)
    assert got["format"] == "ogg-flac"
    assert got["title"] == "oggflac song" and got["track"] == "3"
    out, sr = decode_ogg_flac(b)
    assert sr == 8000 and np.allclose(out[:, 0] * 32768, x, atol=1.0)
