"""Unix compress (.Z) decoder gates (operators/lzw.py, r12).

CONFORMANCE-PINNED two ways, foreign bytes both times: libarchive's
compress writer (``bsdtar -cZf``) authors the fixtures, and gzip's
bundled uncompress independently decodes them — this decoder must
match gzip byte-exactly, including corpora large/random enough to
drive the code width through all stops to 16 bits and trigger the
encoder's CLEAR-on-ratio-drop resets (the group-alignment quirk).
"""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.lzw import decode_z

BSDTAR = shutil.which("bsdtar")
GZIP = shutil.which("gzip")
pytestmark = pytest.mark.skipif(
    BSDTAR is None or GZIP is None,
    reason="bsdtar/gzip reference tools not present")


def _author_z(tmp_path, payload: bytes):
    """tar the payload then compress the TAR with bsdtar -Z (the only
    in-container compress writer); returns the .tar.Z path."""
    (tmp_path / "p.bin").write_bytes(payload)
    out = tmp_path / "p.tar.Z"
    subprocess.run([BSDTAR, "-cZf", str(out), "-C", str(tmp_path),
                    "p.bin"], check=True)
    return out


@pytest.mark.parametrize("shape", ["text", "random", "runs", "mixed"])
def test_conformance_vs_gzip(tmp_path, shape):
    rnd = random.Random(99)
    payload = {
        "text": (b"the quick brown fox jumps over the lazy dog " * 4000),
        # random data forces width growth 9..16 and ratio-drop CLEARs
        "random": bytes(rnd.randrange(256) for _ in range(200000)),
        "runs": b"\x00" * 50000 + b"ab" * 30000 + b"\xff" * 50000,
        "mixed": b"".join(
            bytes(rnd.randrange(4) for _ in range(999)) + b"seg%d" % i
            for i in range(150)),
    }[shape]
    z = _author_z(tmp_path, payload)
    ref = subprocess.run([GZIP, "-dc", str(z)], capture_output=True,
                         check=True).stdout
    assert decode_z(z.read_bytes()) == ref
    assert payload in ref  # the tar contains the payload verbatim


def test_refusals():
    with pytest.raises(UnsupportedMediaError, match="magic"):
        decode_z(b"\x1f\x8b\x00")
    with pytest.raises(UnsupportedMediaError, match="width"):
        decode_z(b"\x1f\x9d\x08")  # maxbits 8 < 9
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        decode_z(b"\x1f\x9d")


def test_decode_cap(tmp_path):
    z = _author_z(tmp_path, b"\x00" * 500000)
    with pytest.raises(UnsupportedMediaError, match="cap"):
        decode_z(z.read_bytes(), max_output=10000)
