"""write_7z writer twin (sources/sevenzip.py, r12).

Unlike test_sevenzip.py these do NOT require bsdtar: the twin exists
precisely for environments without libarchive (the q_7z_scan fixture
falls back to it). Codec streams are real liblzma/libzstd/zlib/bz2
bytes; the container framing is what these tests pin, via byte-exact
round-trips through the strict reader (CRC-verified substreams).
"""

from __future__ import annotations

import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.sources.sevenzip import (_w_number, _R, read_7z_members,
                                             write_7z)

_CODECS = ("store", "deflate", "bzip2", "lzma1", "lzma2", "zstd")

_TREE = [
    ("part0.jsonl", b'{"k":1}\n' * 500),
    ("nested/unié中.txt", "héllo 世界".encode()),
    ("empty.txt", b""),
    ("tail.bin", bytes(range(256)) * 40),
]


@pytest.mark.parametrize("codec", _CODECS)
def test_roundtrip_all_codecs(codec):
    blob = write_7z(_TREE, compression=codec)
    got = [(n, p) for n, p, _s, _m, _is_dir in read_7z_members(blob)]
    assert got == _TREE


def test_number_encoding_inverse():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 10**6, 10**10, 2**56,
              2**63, 2**64 - 1):
        assert _R(_w_number(v)).number() == v


def test_crc_enforced():
    blob = bytearray(write_7z([("a.txt", b"payload-payload")], "store"))
    # flip one payload byte (stored folder: pack bytes start at 32)
    blob[40] ^= 0xFF
    with pytest.raises(UnsupportedMediaError):
        list(read_7z_members(bytes(blob)))


def test_all_empty_members():
    blob = write_7z([("a", b""), ("b", b"")], "lzma2")
    got = list(read_7z_members(blob))
    assert [(n, p) for n, p, *_ in got] == [("a", b""), ("b", b"")]
