"""Zstandard decoder gates (operators/zstd.py, r11 — RFC 8878).

Unlike the MP3/VP8/arith-JPEG stand-ins, zstd has a REFERENCE
implementation in-container (pyarrow bundles libzstd), so the decoder
is conformance-pinned against genuinely foreign bytes: libzstd output
at several levels over several data shapes, exercising Huffman
literals (direct + FSE weights, 1 + 4 streams), FSE-coded / repeat
sequence tables, repeat offsets and multi-block frames — none of it
produced by our twin. The raw-block writer twin is pinned the other
way: libzstd must read our frames byte-exactly.
"""

from __future__ import annotations

import random
import zlib

import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.zstd import decode_zstd, encode_zstd, xxh64


def _lib(level: int = 3):
    import pyarrow as pa
    return pa.Codec("zstd", compression_level=level)


def _datasets() -> dict[str, bytes]:
    rng = random.Random(11)
    return {
        "text": b"the quick brown fox jumps over the lazy dog. " * 800,
        "repetitive": b"ab" * 20000,
        "json": b'{"user": 12345, "event": "click"}\n' * 1200,
        "random": bytes(rng.getrandbits(8) for _ in range(20000)),
        "mixed": b"".join(
            b"A" * 100 + bytes(rng.getrandbits(8) for _ in range(50))
            for _ in range(150)),
        "short": b"hi",
        "empty": b"",
    }


def test_conformance_decode_libzstd_output():
    """Foreign bytes: libzstd-compressed corpora at fast/default/max
    levels must decode byte-exactly."""
    for level in (1, 3, 19):
        codec = _lib(level)
        for name, d in _datasets().items():
            comp = codec.compress(d, asbytes=True)
            assert decode_zstd(comp) == d, (level, name)


def test_conformance_libzstd_reads_our_frames():
    """Mutual pin: the raw-block twin's frames (FCS + checksum) are
    valid input to the reference decoder."""
    codec = _lib()
    for d in (b"", b"x", b"mutual " * 5000, bytes(range(256)) * 300):
        fr = encode_zstd(d)
        assert codec.decompress(fr, len(d), asbytes=True) == d
        assert decode_zstd(fr) == d              # and to ourselves


def test_twin_checksum_and_fcs_enforced():
    d = b"checksummed payload " * 50
    fr = bytearray(encode_zstd(d))
    fr[-1] ^= 0xFF                               # corrupt xxh64 word
    with pytest.raises(ValueError, match="checksum"):
        decode_zstd(bytes(fr))
    assert decode_zstd(bytes(fr), verify_checksum=False) == d
    fr2 = bytearray(encode_zstd(b"abcdef" * 50))
    # frame content size byte (single-segment, 2-byte FCS at offset 5)
    fr2[5] ^= 0x01
    with pytest.raises(ValueError, match="content size"):
        decode_zstd(bytes(fr2))


def test_multi_frame_and_skippable():
    d1, d2 = b"frame one " * 30, b"frame two " * 30
    skippable = (0x184D2A53).to_bytes(4, "little") \
        + (7).to_bytes(4, "little") + b"7 bytes"
    blob = encode_zstd(d1) + skippable + encode_zstd(d2)
    assert decode_zstd(blob) == d1 + d2
    lib = _lib()
    blob2 = lib.compress(d1, asbytes=True) + lib.compress(d2, asbytes=True)
    assert decode_zstd(blob2) == d1 + d2


def test_honest_seams():
    with pytest.raises(ValueError, match="magic"):
        decode_zstd(b"\x00\x01\x02\x03rest")
    with pytest.raises(ValueError, match="truncated"):
        decode_zstd(encode_zstd(b"abc" * 100)[:20])
    # nonzero dictionary id refuses honestly: frame header with
    # did_code=1, single-segment, FCS code 0 -> 1-byte FCS
    fr = ((0xFD2FB528).to_bytes(4, "little")
          + bytes([(1 << 5) | 1, 42, 0])          # FHD, DID=42, FCS=0
          + (1).to_bytes(3, "little"))            # empty last raw block
    with pytest.raises(UnsupportedMediaError, match="dictionary"):
        decode_zstd(fr)
    # reserved block type 3
    fr = ((0xFD2FB528).to_bytes(4, "little") + bytes([1 << 5, 0])
          + (0b111).to_bytes(3, "little"))
    with pytest.raises(ValueError, match="reserved block"):
        decode_zstd(fr)


def test_rle_block_and_long_matches():
    """Shapes that force specific block/sequence forms through
    libzstd: an all-one-byte payload (RLE block), and a long periodic
    payload (long matches / repeat offsets)."""
    lib = _lib()
    ones = b"\x55" * 70000
    assert decode_zstd(lib.compress(ones, asbytes=True)) == ones
    period = (b"0123456789abcdef" * 64 + b"#") * 40
    assert decode_zstd(lib.compress(period, asbytes=True)) == period


def test_fuzz_round_trip_vs_libzstd():
    """128 random structured buffers x random levels — every one must
    decode byte-exactly (foreign-bytes fuzz, deterministic seed)."""
    rng = random.Random(8878)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 9)))
             for _ in range(40)]
    for trial in range(128):
        n = rng.randint(0, 400)
        d = b"".join(rng.choice(words) for _ in range(n))
        level = rng.choice((1, 3, 7, 12))
        comp = _lib(level).compress(d, asbytes=True)
        assert decode_zstd(comp) == d, trial


def test_xxh64_conformance(spark):
    """xxh64 pinned against Spark's JVM XxHash64 (seed 42 — the
    catalyst default) over varied lengths, plus the published
    zero-length seed-0 vector."""
    bufs = [b"", b"a", b"abc", b"0123456789abcdef",
            b"x" * 31, b"y" * 32, b"z" * 33, b"w" * 1000,
            bytes(range(256))]
    rows = [(i, b) for i, b in enumerate(bufs)]
    df = spark.createDataFrame(rows, "i int, b binary")
    got = {r["i"]: r["h"] for r in df.selectExpr(
        "i", "xxhash64(b) AS h").collect()}
    for i, b in rows:
        mine = xxh64(b, seed=42)
        jvm = got[i] & ((1 << 64) - 1)            # JVM long -> u64
        assert mine == jvm, (i, hex(mine), hex(jvm))
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_avro_zstd_codec_round_trip():
    """Avro container with avro.codec=zstd: our writer twin's blocks
    decode; a container whose block libzstd compressed (foreign
    bytes inside the Avro framing) decodes too."""
    from datapump_spark.sources.avro import (_MAGIC, _zigzag, encode_avro,
                                             iter_avro_records,
                                             parse_avro_header)
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"}, {"name": "s", "type": "string"}]}
    recs = [{"k": i, "s": f"value {i % 7}"} for i in range(500)]
    b = encode_avro(schema, recs, codec="zstd")
    got = [r for _, r in iter_avro_records(b)]
    assert got == recs
    # re-frame the SAME records with a libzstd-compressed block
    null_file = encode_avro(schema, recs, codec="null")
    _, _, r, sync = parse_avro_header(null_file)
    n = r.long()
    size = r.long()
    raw_block = r.raw(size)
    comp = _lib().compress(raw_block, asbytes=True)
    header_end = b.index(bytes(range(16))) + 16   # deterministic sync
    foreign = (b[:header_end] + _zigzag(n) + _zigzag(len(comp))
               + comp + sync)
    got2 = [rec for _, rec in iter_avro_records(foreign)]
    assert got2 == recs


def test_avro_zstd_corrupt_block_raises():
    from datapump_spark.sources.avro import encode_avro, iter_avro_records
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"}]}
    b = bytearray(encode_avro(schema, [{"k": 1}, {"k": 2}], codec="zstd"))
    # flip a byte inside the zstd frame (after header+sync+2 varints)
    b[-20] ^= 0xFF
    with pytest.raises(ValueError):
        list(iter_avro_records(bytes(b)))


def test_read_avro_zstd_spark(spark, tmp_path):
    """read_avro over a zstd container lands typed rows in Spark."""
    from datapump_spark.sources.avro import encode_avro, read_avro
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "double"]}]}
    recs = [{"k": i, "v": None if i % 5 == 0 else i / 4} for i in range(64)]
    (tmp_path / "z.avro").write_bytes(
        encode_avro(schema, recs, codec="zstd"))
    rows = {r["k"]: r["v"] for r in read_avro(
        spark, str(tmp_path)).collect()}
    assert rows[0] is None and rows[3] == 0.75 and len(rows) == 64


def test_zlib_crc_unused_guard():
    """The zstd Avro path must NOT expect snappy's CRC32 suffix —
    a frame followed by 4 junk bytes fails sync, not CRC."""
    assert zlib.crc32(b"") == 0                   # import used
    fr = encode_zstd(b"payload")
    assert decode_zstd(fr) == b"payload"


# ---------------------------------------------------------------------------
# Dictionary support (r12 continuation): trained dicts, RFC 8878 §5
# ---------------------------------------------------------------------------

_ZSTD_CLI = __import__("shutil").which("zstd")


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not present")
def test_trained_dictionary_conformance(tmp_path):
    """Train a REAL dictionary with the reference zstd CLI, compress
    foreign samples with -D at several levels, decode with the parsed
    dictionary: the full §5 path (entropy-table init, repeat offsets,
    content-seeded match window) against reference bytes."""
    import random
    import subprocess

    from datapump_spark.operators.zstd import parse_zstd_dict

    rnd = random.Random(7)
    words = ["the", "quick", "brown", "fox", "spark", "engine",
             "corpus", "tokens", "shuffle", "partition", "broadcast"]
    samples = tmp_path / "samples"
    samples.mkdir()
    texts = {}
    for i in range(200):
        t = (" ".join(rnd.choice(words) for _ in range(150))
             + f" doc{i}").encode()
        (samples / f"s{i}.txt").write_bytes(t)
        texts[i] = t
    dict_path = tmp_path / "dict.bin"
    subprocess.run([_ZSTD_CLI, "--train", *map(str, samples.iterdir()),
                    "-o", str(dict_path)], check=True,
                   capture_output=True)
    d = dict_path.read_bytes()
    info = parse_zstd_dict(d)
    assert info["dict_id"] != 0 and len(info["content"]) > 1000
    dicts = {info["dict_id"]: d}
    for i, lv in ((0, 3), (17, 1), (42, 19), (99, 3)):
        z = tmp_path / f"s{i}.zst"
        subprocess.run([_ZSTD_CLI, "-q", f"-{lv}", "-D", str(dict_path),
                        str(samples / f"s{i}.txt"), "-o", str(z)],
                       check=True)
        assert decode_zstd(z.read_bytes(), dicts=dicts) == texts[i]
    # honest refusal without the dictionary
    z0 = (tmp_path / "s0.zst").read_bytes()
    with pytest.raises(UnsupportedMediaError, match="dictionary"):
        decode_zstd(z0)
    # raw content blob (no magic) parses as a content-only dictionary
    raw = parse_zstd_dict(b"just a prefix window")
    assert raw["dict_id"] == 0 and raw["huff"] is None
    assert raw["content"] == b"just a prefix window"
