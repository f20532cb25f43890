"""LZ4 codec gates (operators/lz4.py, r12).

CONFORMANCE-PINNED against pyarrow's bundled reference liblz4 (the
zstd/snappy/brotli doctrine), BOTH directions and BOTH formats:
foreign liblz4 block (``lz4_raw``) and frame (``lz4``) output decode
byte-exactly; liblz4 decodes this module's block and frame output
byte-exactly (the encoder honors the spec's end-of-block rules). Plus
the frame features liblz4's default path doesn't emit — linked
blocks, block checksums, skippable frames, stored blocks — on
hand-authored frames that liblz4 must also accept, and the honest
refusals (legacy frames, dictionaries, checksum mismatches, bombs).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.lz4 import (
    decode_lz4_block,
    decode_lz4_frame,
    encode_lz4_block,
    encode_lz4_frame,
    xxh32,
)

_RAW = pa.Codec("lz4_raw")
_FRAME = pa.Codec("lz4")


def _corpora() -> list[bytes]:
    rnd = random.Random(1234)
    return [
        b"",
        b"a",
        b"abcd",
        b"ab" * 40000,  # long match, length extension bytes
        bytes(rnd.randrange(256) for _ in range(6000)),  # incompressible
        (b"the quick brown fox jumps over the lazy dog " * 300)[:9999],
        bytes(rnd.randrange(3) for _ in range(120000)),  # dense overlaps
        b"\x00" * 70000,  # RLE-like, 64 KB frame-block boundary
    ]


# ---------------------------------------------------------------------------
# XXH32 primitive
# ---------------------------------------------------------------------------


def test_xxh32_vectors():
    # published reference vectors (xxHash repository)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"Hello World") == 0xB1FD16EE
    assert xxh32(b"abc", seed=1) == 0xAA3DA8FF


# ---------------------------------------------------------------------------
# Conformance, both directions, both formats
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("idx", range(8))
def test_block_conformance_both_directions(idx):
    data = _corpora()[idx]
    foreign = _RAW.compress(data, asbytes=True)
    assert decode_lz4_block(foreign) == data
    ours = encode_lz4_block(data)
    assert _RAW.decompress(ours, len(data), asbytes=True) == data
    assert decode_lz4_block(ours) == data


@pytest.mark.parametrize("idx", range(8))
def test_frame_conformance_both_directions(idx):
    data = _corpora()[idx]
    foreign = _FRAME.compress(data, asbytes=True)
    assert decode_lz4_frame(foreign) == data
    ours = encode_lz4_frame(data)
    assert _FRAME.decompress(ours, len(data), asbytes=True) == data
    assert decode_lz4_frame(ours) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=3000),
       st.sampled_from([b"", b"lz4lz4", b"\x00\x01\x02\x03" * 64]))
def test_property_round_trip_vs_reference(data, salt):
    """Hypothesis sweep: our encode must be accepted byte-exactly by
    liblz4 AND our decode must accept liblz4 output (block + frame)."""
    blob = salt + data + salt
    assert decode_lz4_block(_RAW.compress(blob, asbytes=True)) == blob
    assert _RAW.decompress(encode_lz4_block(blob), len(blob),
                           asbytes=True) == blob
    assert decode_lz4_frame(_FRAME.compress(blob, asbytes=True)) == blob
    assert _FRAME.decompress(encode_lz4_frame(blob), len(blob),
                             asbytes=True) == blob


# ---------------------------------------------------------------------------
# Frame features liblz4's default path doesn't emit
# ---------------------------------------------------------------------------


def _manual_frame(flg: int, blocks: list[bytes | tuple[bytes, bool]],
                  content: bytes | None = None,
                  block_checksums: bool = False) -> bytes:
    """Hand-author a frame: blocks are (data, stored?) pairs."""
    bd = 0x40  # 64 KB max block size
    desc = bytes([flg, bd])
    out = bytearray((0x184D2204).to_bytes(4, "little"))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for blk in blocks:
        data, stored = blk if isinstance(blk, tuple) else (blk, False)
        size = len(data) | (0x80000000 if stored else 0)
        out += size.to_bytes(4, "little")
        out += data
        if block_checksums:
            out += xxh32(data).to_bytes(4, "little")
    out += (0).to_bytes(4, "little")
    if content is not None:
        out += xxh32(content).to_bytes(4, "little")
    return bytes(out)


def test_linked_blocks_cross_block_match():
    """B.Indep=0: block 2's match offsets reach into block 1's
    plaintext. liblz4 must agree with our decode."""
    plain1 = b"abcdefgh" * 10  # 80 bytes
    blk1 = encode_lz4_block(plain1)
    # block 2: zero literals then match len 20 at offset 80 (entirely
    # in block 1's history), then a 12-literal end sequence (the spec's
    # end-of-block margins, which liblz4's safe decoder enforces)
    tail = b"0123456789AB"
    blk2 = bytes([0x0F, 80, 0, 1, 0xC0]) + tail
    expect = plain1 + plain1[:20] + tail
    frame = _manual_frame(0x40, [blk1, blk2])  # v01, linked, no extras
    assert decode_lz4_frame(frame) == expect
    assert _FRAME.decompress(frame, len(expect), asbytes=True) == expect


def test_block_checksums_and_stored_blocks():
    plain = b"stored block payload " * 50
    frame = _manual_frame(0x50, [(plain, True)], block_checksums=True)
    assert decode_lz4_frame(frame) == plain
    assert _FRAME.decompress(frame, len(plain), asbytes=True) == plain
    # corrupt the block checksum (trails the block payload) -> refusal
    bad = (frame[:7 + 4 + len(plain)] + b"\xde\xad\xbe\xef"
           + frame[7 + 4 + len(plain) + 4:])
    with pytest.raises(UnsupportedMediaError, match="block checksum"):
        decode_lz4_frame(bad)


def test_content_checksum_and_mismatch():
    plain = b"content-checksummed" * 30
    blk = encode_lz4_block(plain)
    frame = _manual_frame(0x44, [blk], content=plain)
    assert decode_lz4_frame(frame) == plain
    bad = frame[:-4] + b"\x00\x00\x00\x00"
    with pytest.raises(UnsupportedMediaError, match="content checksum"):
        decode_lz4_frame(bad)


def test_skippable_frame_and_concatenation():
    a, b = b"first frame " * 20, b"second frame " * 20
    skip = (0x184D2A5F).to_bytes(4, "little") + (6).to_bytes(
        4, "little") + b"IGNORE"
    blob = encode_lz4_frame(a) + skip + encode_lz4_frame(b)
    assert decode_lz4_frame(blob) == a + b


_LZ4_CLI = __import__("shutil").which("lz4")


@pytest.mark.skipif(_LZ4_CLI is None, reason="lz4 CLI not present")
def test_legacy_frame_conformance(tmp_path):
    """``lz4 -l`` (legacy frame, the old-kernel format) — foreign CLI
    bytes decode byte-exactly, including multi-block (>8 MiB) inputs."""
    import subprocess

    payload = (b"legacy frame payload " * 500000)[:9 << 20]  # 2 blocks
    src = tmp_path / "p.bin"
    src.write_bytes(payload)
    out = tmp_path / "p.lz4"
    subprocess.run([_LZ4_CLI, "-q", "-l", str(src), str(out)], check=True)
    data = out.read_bytes()
    assert data[:4] == (0x184C2102).to_bytes(4, "little")
    assert decode_lz4_frame(data) == payload


def test_refusals():
    with pytest.raises(UnsupportedMediaError, match="magic"):
        decode_lz4_frame(b"NOTLZ4XX")
    # dictionary flag set
    desc = bytes([0x41, 0x40, 0x2A, 0x00, 0x00, 0x00])
    frame = ((0x184D2204).to_bytes(4, "little") + desc
             + bytes([(xxh32(desc) >> 8) & 0xFF]))
    with pytest.raises(UnsupportedMediaError, match="dictionar"):
        decode_lz4_frame(frame)
    # corrupted header checksum
    good = encode_lz4_frame(b"x" * 100)
    bad = good[:14] + bytes([good[14] ^ 0xFF]) + good[15:]
    with pytest.raises(UnsupportedMediaError, match="header checksum"):
        decode_lz4_frame(bad)
    # content size mismatch
    good = bytearray(encode_lz4_frame(b"y" * 100))
    good[6:14] = (99).to_bytes(8, "little")
    desc = bytes(good[4:14])
    good[14] = (xxh32(desc) >> 8) & 0xFF
    with pytest.raises(UnsupportedMediaError, match="content size"):
        decode_lz4_frame(bytes(good))


def test_decode_cap_bomb_guard():
    bomb = encode_lz4_frame(b"\x00" * 500000)
    with pytest.raises(UnsupportedMediaError, match="cap"):
        decode_lz4_frame(bomb, max_output=10000)
    with pytest.raises(UnsupportedMediaError, match="cap"):
        decode_lz4_block(_RAW.compress(b"\x00" * 500000, asbytes=True),
                         max_output=10000)
