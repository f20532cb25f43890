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


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = [b ^ k for b, k in zip(block, rks[0])]
    nr = len(rks) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major byte order: row r rotates left r
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < nr:
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3),
                    _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2),
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates right r
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rks[rnd])]
        if rnd > 0:
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _gmul(a[0], 14) ^ _gmul(a[1], 11)
                    ^ _gmul(a[2], 13) ^ _gmul(a[3], 9),
                    _gmul(a[0], 9) ^ _gmul(a[1], 14)
                    ^ _gmul(a[2], 11) ^ _gmul(a[3], 13),
                    _gmul(a[0], 13) ^ _gmul(a[1], 9)
                    ^ _gmul(a[2], 14) ^ _gmul(a[3], 11),
                    _gmul(a[0], 11) ^ _gmul(a[1], 13)
                    ^ _gmul(a[2], 9) ^ _gmul(a[3], 14),
                ]
            s = t
    return bytes(s)


def aes_encrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _encrypt_block(block, _expand_key(key))


def aes_decrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _decrypt_block(block, _expand_key(key))


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes | None = None,
                    unpad: bool = True) -> bytes:
    """CBC decrypt; ``iv=None`` takes the first 16 bytes as the IV
    (the PDF AESV2 stream layout). PKCS#7 padding is stripped when
    ``unpad`` (tolerantly: an invalid pad byte raises)."""
    if iv is None:
        iv, data = data[:16], data[16:]
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks),
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


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding, IV prepended (the PDF AESV2
    stream layout) — fixture-writer twin of aes_cbc_decrypt."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    n = 16 - len(data) % 16
    data = data + bytes([n]) * n
    rks = _expand_key(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)
