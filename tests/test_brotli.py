"""Brotli decoder gates (operators/brotli.py, r12 — VERDICT r11 #2).

CONFORMANCE-PINNED against pyarrow's bundled reference libbrotli (the
zstd/snappy doctrine): foreign libbrotli output at all 12 quality
levels decodes byte-exactly, libbrotli accepts and agrees on this
module's authored streams (writer twin + exotic paths the reference
encoder rarely emits), and the derived data tables (static dictionary,
transforms, context LUTs) are spot-checked against known published
values. Plus the HTTP Content-Encoding integration (sources/http.py)
and the WARC crawl path."""

from __future__ import annotations

import gzip as gzmod
import os
import random
import zlib

import pyarrow as pa
import pytest

from datapump_spark.operators.brotli import (
    BrotliError,
    _BLOCK_LEN_BITS,
    _BLOCK_LEN_OFF,
    _BW,
    _complete_lengths,
    _ic_symbol,
    _LenWriter,
    _w_flat_code,
    _w_mlen,
    _w_varlen_u8,
    _w_wbits,
    author_stream,
    decode_brotli,
    encode_brotli,
)


def _ref_decode(z: bytes) -> bytes:
    return bytes(pa.CompressedInputStream(
        pa.BufferReader(z), "brotli").read())


def _ref_encode(t: bytes, level: int) -> bytes:
    return bytes(pa.Codec("brotli", compression_level=level).compress(t))


# ---------------------------------------------------------------------------
# Foreign-stream conformance (reference encoder -> our decoder)
# ---------------------------------------------------------------------------

_SHAPES = {
    "english": b"The quick brown fox jumps over the lazy dog. " * 120,
    "html": (b'<!DOCTYPE html><html><head><meta charset="utf-8">'
             b'<script type="text/javascript" src="x.js"></script></head>'
             b'<body><div class="content"><p>description content with '
             b'position:absolute; and more dictionary words</p></div>'
             b"</body></html>" * 20),
    "utf8": ("текст про кодеки — çédille, 日本語。" * 90).encode(),
    "runs": b"\x00" * 2000 + b"ab" * 1500,
    "json": b'{"name": "value", "count": 12345, "list": [1, 2, 3]}' * 80,
}


# default tier: three levels spanning the fast/balanced/max
# encoders; the slow-tier fuzz sweep crosses all 12 levels
@pytest.mark.parametrize("level", [1, 5, 11])
def test_foreign_streams_decode_exactly(level):
    for name, t in _SHAPES.items():
        assert decode_brotli(_ref_encode(t, level)) == t, (level, name)


def test_foreign_random_and_tiny():
    rng = random.Random(3)
    for t in (b"", b"Q", os.urandom(1), os.urandom(3000),
              bytes(rng.choices(range(8), k=9000))):
        for level in (1, 6, 11):
            assert decode_brotli(_ref_encode(t, level)) == t


@pytest.mark.slow  # redundancy: the in-default level sweep above
# covers every level on 5 shapes; this is the broad randomized sweep
def test_foreign_fuzz_sweep():
    gen = random.Random(7)
    words = [b"the", b"of", b"content", b"<div>", b"http://",
             b"\xc3\xa9t\xc3\xa9", b" ", b"\n", b"12345"]
    for trial in range(120):
        n = gen.randrange(0, 20000)
        kind = gen.randrange(4)
        if kind == 0:
            t = os.urandom(n)
        elif kind == 1:
            t = bytes(gen.choices(range(8), k=n))
        elif kind == 2:
            t = b"".join(gen.choices(words, k=n // 4))
        else:
            t = os.urandom(max(1, n // 100)) * 100 if n else b""
        lvl = gen.randrange(12)
        assert decode_brotli(_ref_encode(t, lvl)) == t, (trial, lvl, kind)


# ---------------------------------------------------------------------------
# Writer twin + authored streams (our encoder -> reference decoder)
# ---------------------------------------------------------------------------

def test_writer_twin_round_trips_both_decoders():
    for t in (b"", b"x", b"hello world" * 300, bytes(range(256)) * 20):
        z = encode_brotli(t)
        assert decode_brotli(z) == t
        assert _ref_decode(z) == t


def test_authored_commands_both_decoders():
    # literals, back-references (incl. overlap), implicit d0 (initial
    # ring buffer last = 4), explicit distance code 0
    z = author_stream([{"commands": [(b"abcdef", 4, 6), (b"XY", 5, 3)]}])
    out = bytearray(b"abcdef")
    for _ in range(4):
        out.append(out[-6])
    out += b"XY"
    for _ in range(5):
        out.append(out[-3])
    assert decode_brotli(z) == bytes(out) == _ref_decode(z)

    z = author_stream([{"commands": [(b"wxyz", 3, 0), (b"", 3, -1)]}])
    out = bytearray(b"wxyz")
    for _ in range(6):
        out.append(out[-4])
    assert decode_brotli(z) == bytes(out) == _ref_decode(z)


def test_authored_metablock_kinds():
    # uncompressed metablocks, multiple compressed metablocks, and a
    # metadata block (skipped content) — all agreed with libbrotli
    z = author_stream([{"uncompressed": b"AAAA"},
                       {"commands": [(b"", 4, 4)]},
                       {"commands": [(b"tail", 0, 0)]}])
    assert decode_brotli(z) == b"AAAAAAAAtail" == _ref_decode(z)

    bw = _BW()
    _w_wbits(bw, 22)
    bw.write(0, 1)                       # not last
    bw.write(3, 2)                       # MNIBBLES=0: metadata
    bw.write(0, 1)                       # reserved
    bw.write(1, 2)                       # 1 skip-length byte
    bw.write(6, 8)                       # skip 7 bytes
    bw.align_byte()
    bw.write_bytes(b"METAxyz")
    bw.write(0, 1)
    _w_mlen(bw, 2)
    bw.write(1, 1)                       # uncompressed
    bw.align_byte()
    bw.write_bytes(b"ok")
    bw.write(1, 1)
    bw.write(1, 1)
    z = bw.getvalue()
    assert decode_brotli(z) == b"ok" == _ref_decode(z)


def test_dictionary_reference_and_transform():
    # distance beyond the window at pos 0 -> static dictionary; the
    # first 4-letter word is 'time' (published RFC 7932 appendix)
    z = author_stream([{"commands": [(b"", 4, 1)], "mlen": 4}])
    assert decode_brotli(z) == b"time" == _ref_decode(z)
    # transform 0 at length 5 word 0 = 'first'
    z = author_stream([{"commands": [(b"", 5, 1)], "mlen": 5}])
    assert decode_brotli(z) == b"first" == _ref_decode(z)
    # a transformed reference: any tid < 121 must agree with libbrotli
    from datapump_spark.operators.brotli import _DICT_NDBITS
    for tid in (4, 9, 44, 77, 120):
        d = (tid << _DICT_NDBITS[13]) + 1 + 1    # word id 1, len 13
        for out_len in range(4, 40):
            z = author_stream([{"commands": [(b"", 13, d)],
                                "mlen": out_len}], wbits=10)
            try:
                want = _ref_decode(z)
            except OSError:
                continue
            assert decode_brotli(z) == want, tid
            break
        else:
            pytest.fail(f"transform {tid}: no output length accepted")


def test_dict_ref_does_not_enter_distance_ring_buffer():
    # dict ref then implicit d0: d0 must resolve against the
    # PRE-dict-ref buffer (initial last = 4) — pinned vs libbrotli
    z = author_stream([{"commands": [(b"", 4, 1), (b"", 4, 0)],
                        "mlen": 8}])
    want = _ref_decode(z)
    assert want == b"timetime"        # d0 -> distance 4 -> 'time' again
    assert decode_brotli(z) == want


def test_block_switching_and_count_table():
    """nbl_L=2 with per-type literal trees: the A->B switch position
    IS the decoded block length — probes the count table tail that the
    first transcription got wrong (syms 17+)."""
    def probe(count_sym, extra, n_lits):
        bw = _BW()
        _w_wbits(bw, 22)
        bw.write(0, 1)
        _w_mlen(bw, n_lits)
        bw.write(0, 1)
        _w_varlen_u8(bw, 2)
        bw.write(1, 2)
        bw.write(0, 2)
        bw.write(1, 2)                   # type tree single '1'
        bw.write(1, 2)
        bw.write(0, 2)
        bw.write(count_sym, 5)           # count tree single
        bw.write(extra, _BLOCK_LEN_BITS[count_sym])
        _w_varlen_u8(bw, 1)
        _w_varlen_u8(bw, 1)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(0, 2)
        bw.write(0, 2)
        _w_varlen_u8(bw, 2)
        bw.write(1, 1)
        bw.write(5, 4)                   # rlemax 6
        bw.write(1, 2)
        bw.write(1, 2)
        bw.write(6, 3)
        bw.write(7, 3)
        bw.write(0, 1)
        bw.write(0, 6)                   # 64 zeros
        for _ in range(64):
            bw.write(1, 1)               # 64x tree-1
        bw.write(0, 1)
        _w_varlen_u8(bw, 1)
        for byte in (65, 66):
            bw.write(1, 2)
            bw.write(0, 2)
            bw.write(byte, 8)
        sym, (ie, ib), (ce, cb) = _ic_symbol(n_lits, 2, False)
        bw.write(1, 2)
        bw.write(0, 2)
        bw.write(sym, 10)
        bw.write(1, 2)
        bw.write(0, 2)
        bw.write(0, 6)
        bw.write(ie, ib)
        bw.write(ce, cb)
        bw.write((1 << _BLOCK_LEN_BITS[count_sym]) - 1,
                 _BLOCK_LEN_BITS[count_sym])
        bw.write(1, 1)
        bw.write(1, 1)                   # last empty block
        z = bw.getvalue()
        out = _ref_decode(z)
        assert decode_brotli(z) == out
        return out

    for s in (0, 8, 16, 17, 19, 23):
        blen = _BLOCK_LEN_OFF[s] + 1
        if blen > 6000:
            continue
        out = probe(s, 1, blen + 3)
        a_run = len(out) - len(out.lstrip(b"A"))
        assert a_run == blen and out[a_run:] == b"BBB", s


def test_complete_lengths_codes_accepted_by_reference():
    # complex-code writer over awkward alphabets (gaps forcing 17-run
    # stacking + literal-zero chain breaks)
    syms = [0, 1, 2, 3, 40, 41, 200, 201, 202, 255]
    bw = _BW()
    _w_wbits(bw, 22)
    bw.write(0, 1)
    _w_mlen(bw, len(syms))
    bw.write(0, 1)
    for _ in range(3):
        _w_varlen_u8(bw, 1)
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0, 2)
    _w_varlen_u8(bw, 1)
    _w_varlen_u8(bw, 1)
    code = _LenWriter(_complete_lengths(syms), 256).write(bw)
    sym, (ie, ib), (ce, cb) = _ic_symbol(len(syms), 2, False)
    bw.write(1, 2)
    bw.write(0, 2)
    bw.write(sym, 10)
    bw.write(1, 2)
    bw.write(0, 2)
    bw.write(0, 6)
    bw.write(ie, ib)
    bw.write(ce, cb)
    for s in syms:
        code.write(bw, s)
    bw.write(1, 1)
    bw.write(1, 1)
    z = bw.getvalue()
    assert _ref_decode(z) == bytes(syms)
    assert decode_brotli(z) == bytes(syms)


def test_invalid_streams_raise():
    z = encode_brotli(b"hello world")
    with pytest.raises(BrotliError):
        decode_brotli(z[:-2])            # truncated
    with pytest.raises(BrotliError):
        decode_brotli(b"")
    with pytest.raises(BrotliError, match="dictionary copy length"):
        # distance > max_dist with copy_len 2: outside the 4-24
        # dictionary word range
        decode_brotli(author_stream([{"commands": [(b"ab", 2, 9)]}]))
    with pytest.raises(BrotliError, match="max_output"):
        decode_brotli(encode_brotli(b"x" * 100), max_output=10)


def test_derived_tables_spot_values():
    """Published RFC 7932 values as independent cross-checks of the
    derivation (appendix words, identity transform, UTF8 classes)."""
    from datapump_spark.operators import brotli_tables as t
    from datapump_spark.operators.brotli import _dict_word
    assert _dict_word(4, 0) == b"time"
    assert _dict_word(5, 0) == b"first"
    assert _dict_word(6, 0) == b"&quot;"
    assert t.TRANSFORMS[0] == (b"", 0, b"")       # identity
    # UTF8 mode: space after a letter is a distinct context from
    # space after space; control bytes class 0
    assert t.CTX_UTF8_P1[0] == 0
    assert t.CTX_UTF8_P1[ord(" ")] != t.CTX_UTF8_P1[ord("a")]
    assert len(t.CTX_UTF8_P1) == 256 and len(t.CTX_SIGNED_P2) == 256


# ---------------------------------------------------------------------------
# HTTP Content-Encoding + WARC crawl integration
# ---------------------------------------------------------------------------

def test_http_wire_decoding_unit():
    from datapump_spark.sources.http import decode_http_response
    body = "Ce renard brun — wire décodé!".encode()
    # chunked framing with extensions and trailers
    chunked = b""
    for i in range(0, len(body), 7):
        c = body[i:i + 7]
        chunked += format(len(c), "x").encode() + b";x=1\r\n" + c + b"\r\n"
    chunked += b"0\r\nX-Trailer: t\r\n\r\n"
    r = decode_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked)
    assert r["body"] == body and r["status"] == 200 and r["error"] is None
    # gzip (multi-member), deflate (raw), brotli, chained chunked+gzip
    for enc, payload in (
            (b"gzip", gzmod.compress(body) + gzmod.compress(b"!")),
            (b"deflate", zlib.compress(body)[2:-4]),
            (b"deflate", zlib.compress(body)),
            (b"br", _ref_encode(body, 5))):
        r = decode_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: " + enc + b"\r\n\r\n"
            + payload)
        want = body + (b"!" if payload.endswith(gzmod.compress(b"!"))
                       else b"")
        assert r["body"] == want, enc
    # undecodable -> flagged, not mojibake
    r = decode_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnotgzip")
    assert r["body"] is None and "gzip" in r["error"]
    r = decode_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: compress\r\n\r\nx")
    assert "unsupported" in r["error"]


def _warc_response(uri: str, http: bytes) -> bytes:
    return (b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n")


def test_warc_crawl_decodes_encoded_bodies(spark, tmp_path):
    """A crawl WARC whose responses use chunked + gzip + br + plain:
    all four yield clean text through read_warc_html (previously the
    encoded ones became mojibake the quality gate silently dropped);
    a corrupted body surfaces in read_warc_http as a flagged row."""
    page = ('<html><body><p>Ce renard brun rapide saute par-dessus le '
            'chien paresseux chaque matin, naturellement.</p>'
            '</body></html>').encode()
    gz = gzmod.compress(page)
    chunked = (format(len(gz), "x").encode() + b"\r\n" + gz
               + b"\r\n0\r\n\r\n")
    recs = (
        _warc_response("https://x.example/plain",
                       b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                       b"\r\n" + page)
        + _warc_response("https://x.example/gzip",
                         b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
                         b"\r\n\r\n" + gz)
        + _warc_response("https://x.example/br",
                         b"HTTP/1.1 200 OK\r\nContent-Encoding: br"
                         b"\r\n\r\n" + _ref_encode(page, 5))
        + _warc_response("https://x.example/chunked-gzip",
                         b"HTTP/1.1 200 OK\r\n"
                         b"Transfer-Encoding: chunked\r\n"
                         b"Content-Encoding: gzip\r\n\r\n" + chunked)
        + _warc_response("https://x.example/broken",
                         b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
                         b"\r\n\r\n" + gz[:-4])
    )
    p = tmp_path / "crawl.warc"
    p.write_bytes(recs)

    from datapump_spark.sources.warc import read_warc_html, read_warc_http

    rows = {r["target_uri"]: r for r in
            read_warc_html(spark, str(p)).collect()}
    assert set(rows) == {f"https://x.example/{k}" for k in
                         ("plain", "gzip", "br", "chunked-gzip")}
    for r in rows.values():
        assert r["main_text"].startswith("Ce renard brun rapide")

    audit = {r["target_uri"]: r for r in
             read_warc_http(spark, str(p)).collect()}
    assert len(audit) == 5
    bad = audit["https://x.example/broken"]
    assert bad["http_error"] and "gzip" in bad["http_error"]
    assert bad["http_text"] is None
    ok = audit["https://x.example/br"]
    assert ok["content_encoding"] == "br" and ok["http_error"] is None
