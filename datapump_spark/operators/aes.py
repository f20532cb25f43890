"""Pure-Python AES (FIPS 197) — decrypt-side primitive for AESV2
PDF streams (round 9).

Tables are DERIVED, not transcribed: the S-box is the GF(2^8)
multiplicative inverse followed by the specified affine transform, the
round constants come from doubling in the field — so correctness rests
on the published algorithm alone, pinned by the FIPS-197 appendix
test vectors in tests/test_pdftext.py. Only the narrow surface the PDF
security handler needs is exposed: ECB block encrypt/decrypt and CBC
with PKCS#7 padding. This is a format decoder dependency, not a
general crypto library — no authenticated modes, no constant-time
claims."""

from __future__ import annotations

import functools


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses via exp/log tables over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    sbox = [0] * 256
    inv_sbox = [0] * 256
    for v in range(256):
        # the exp cycle has length 255: exp[255 - log[1]] must wrap
        # back to exp[0] = 1
        inv = exp[(255 - log[v]) % 255] if v else 0
        b = inv
        s = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        s ^= 0x63
        sbox[v] = s
        inv_sbox[s] = v
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
for _ in range(9):
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    """Key schedule for AES-128/192/256 -> list of round keys (each a
    16-int list, column-major state order as FIPS 197 words)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [[words[4 * r + c][j] for c in range(4) for j in range(4)]
            for r in range(nr + 1)]


# T-tables (round 9 perf): the classic Rijndael word tables, DERIVED
# at import from the same GF arithmetic as the S-box (never
# transcribed). Encryption folds SubBytes+ShiftRows+MixColumns into 4
# lookups per output word; decryption uses the equivalent inverse
# cipher (round keys passed through InvMixColumns). ~100x over the
# per-byte schoolbook loops — the PDF 2.0 password hash (Algorithm
# 2.B) runs 64+ chained CBC rounds per document and made the naive
# form a 1.8 s/hash bottleneck.

def _ror8(w: int) -> int:
    return ((w >> 8) | (w << 24)) & 0xFFFFFFFF


def _build_tables():
    te0, td0 = [], []
    for x in range(256):
        sx = _SBOX[x]
        te0.append((_gmul(sx, 2) << 24) | (sx << 16) | (sx << 8)
                   | _gmul(sx, 3))
        ix = _INV_SBOX[x]
        td0.append((_gmul(ix, 14) << 24) | (_gmul(ix, 9) << 16)
                   | (_gmul(ix, 13) << 8) | _gmul(ix, 11))
    te = [te0, [_ror8(w) for w in te0]]
    te.append([_ror8(w) for w in te[1]])
    te.append([_ror8(w) for w in te[2]])
    td = [td0, [_ror8(w) for w in td0]]
    td.append([_ror8(w) for w in td[1]])
    td.append([_ror8(w) for w in td[2]])
    return te, td


(_TE0, _TE1, _TE2, _TE3), (_TD0, _TD1, _TD2, _TD3) = _build_tables()


def _words(rk: list[int]) -> list[int]:
    """One 16-int column-major round key -> 4 big-endian u32 words."""
    return [(rk[i] << 24) | (rk[i + 1] << 16) | (rk[i + 2] << 8)
            | rk[i + 3] for i in (0, 4, 8, 12)]


def _imc(w: int) -> int:
    """InvMixColumns of a round-key word (Td o S cancels InvSubBytes)."""
    return (_TD0[_SBOX[w >> 24]] ^ _TD1[_SBOX[(w >> 16) & 0xFF]]
            ^ _TD2[_SBOX[(w >> 8) & 0xFF]] ^ _TD3[_SBOX[w & 0xFF]])


@functools.lru_cache(maxsize=64)
def _enc_schedule(key: bytes) -> list[list[int]]:
    return [_words(rk) for rk in _expand_key(key)]


@functools.lru_cache(maxsize=64)
def _dec_schedule(key: bytes) -> list[list[int]]:
    """Equivalent-inverse-cipher keys: reversed, middle rounds through
    InvMixColumns."""
    rks = _enc_schedule(key)
    nr = len(rks) - 1
    out = [rks[nr]]
    for i in range(nr - 1, 0, -1):
        out.append([_imc(w) for w in rks[i]])
    out.append(rks[0])
    return out


def _encrypt_block_w(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    k = rks[0]
    s0 = int.from_bytes(block[0:4], "big") ^ k[0]
    s1 = int.from_bytes(block[4:8], "big") ^ k[1]
    s2 = int.from_bytes(block[8:12], "big") ^ k[2]
    s3 = int.from_bytes(block[12:16], "big") ^ k[3]
    for rnd in range(1, nr):
        k = rks[rnd]
        t0 = (_TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF]
              ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ k[0])
        t1 = (_TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF]
              ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ k[1])
        t2 = (_TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF]
              ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ k[2])
        t3 = (_TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF]
              ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ k[3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = rks[nr]
    sb = _SBOX
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
          | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ k[0]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
          | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ k[1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
          | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ k[2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
          | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ k[3]
    return b"".join(w.to_bytes(4, "big") for w in (o0, o1, o2, o3))


def _decrypt_block_w(block: bytes, dks: list[list[int]]) -> bytes:
    nr = len(dks) - 1
    k = dks[0]
    s0 = int.from_bytes(block[0:4], "big") ^ k[0]
    s1 = int.from_bytes(block[4:8], "big") ^ k[1]
    s2 = int.from_bytes(block[8:12], "big") ^ k[2]
    s3 = int.from_bytes(block[12:16], "big") ^ k[3]
    for rnd in range(1, nr):
        k = dks[rnd]
        t0 = (_TD0[s0 >> 24] ^ _TD1[(s3 >> 16) & 0xFF]
              ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ k[0])
        t1 = (_TD0[s1 >> 24] ^ _TD1[(s0 >> 16) & 0xFF]
              ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ k[1])
        t2 = (_TD0[s2 >> 24] ^ _TD1[(s1 >> 16) & 0xFF]
              ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ k[2])
        t3 = (_TD0[s3 >> 24] ^ _TD1[(s2 >> 16) & 0xFF]
              ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ k[3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = dks[nr]
    ib = _INV_SBOX
    o0 = ((ib[s0 >> 24] << 24) | (ib[(s3 >> 16) & 0xFF] << 16)
          | (ib[(s2 >> 8) & 0xFF] << 8) | ib[s1 & 0xFF]) ^ k[0]
    o1 = ((ib[s1 >> 24] << 24) | (ib[(s0 >> 16) & 0xFF] << 16)
          | (ib[(s3 >> 8) & 0xFF] << 8) | ib[s2 & 0xFF]) ^ k[1]
    o2 = ((ib[s2 >> 24] << 24) | (ib[(s1 >> 16) & 0xFF] << 16)
          | (ib[(s0 >> 8) & 0xFF] << 8) | ib[s3 & 0xFF]) ^ k[2]
    o3 = ((ib[s3 >> 24] << 24) | (ib[(s2 >> 16) & 0xFF] << 16)
          | (ib[(s1 >> 8) & 0xFF] << 8) | ib[s0 & 0xFF]) ^ k[3]
    return b"".join(w.to_bytes(4, "big") for w in (o0, o1, o2, o3))


def aes_encrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _encrypt_block_w(block, _enc_schedule(key))


def aes_decrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _decrypt_block_w(block, _dec_schedule(key))


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes | None = None,
                    unpad: bool = True) -> bytes:
    """CBC decrypt; ``iv=None`` takes the first 16 bytes as the IV
    (the PDF AESV2 stream layout). PKCS#7 padding is stripped when
    ``unpad`` (tolerantly: an invalid pad byte raises)."""
    if iv is None:
        iv, data = data[:16], data[16:]
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    dks = _dec_schedule(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block_w(blk, dks),
                                           prev))
        prev = blk
    if unpad:
        if not out:
            return b""
        n = out[-1]
        if not 1 <= n <= 16 or len(out) < n:
            raise ValueError("bad PKCS#7 padding")
        del out[-n:]
    return bytes(out)


def aes_cbc_encrypt_nopad(data: bytes, key: bytes, iv: bytes) -> bytes:
    """Raw CBC encrypt of block-aligned data, no padding, no IV
    prefix — the primitive the PDF 2.0 hash (Algorithm 2.B) and the
    /UE //OE file-key wrapping use."""
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    rks = _enc_schedule(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block_w(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding, IV prepended (the PDF AESV2
    stream layout) — fixture-writer twin of aes_cbc_decrypt."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    n = 16 - len(data) % 16
    data = data + bytes([n]) * n
    rks = _enc_schedule(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block_w(blk, rks)
        out += prev
    return bytes(out)
