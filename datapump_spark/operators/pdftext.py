"""PDF text extraction in pure Python — the web corpus' second-biggest
document format after HTML.

Scope (the common machine-generated case, asserted honestly):
- classic cross-reference PDFs AND xref-stream PDFs are both handled by
  object scanning (``N G obj … endobj``), so damaged/linearized files
  still extract; objects packed inside compressed object streams
  (/ObjStm, §7.5.7 — the modern layout) are expanded into the scan
  (r8), so their page/font dicts count and resolve;
- content streams stored raw, FlateDecode- (zlib) or LZWDecode-
  compressed (r8: full TIFF-variant LZW incl. /EarlyChange);
- Standard-security-handler encryption — RC4 V1/V2, R2/R3 (r8),
  AES-128-CBC V4/R4 /CFM /AESV2 (r9, pure-Python AES in
  operators/aes.py pinned to the FIPS-197 vectors) AND AES-256 V5/R5-6
  /AESV3 (r9, ISO 32000-2 Algorithm 2.A/2.B) — is decrypted and
  flagged ``decrypted``; the caller may supply a user OR owner
  password (r10; V5 hashes its NFKC'd UTF-8 form, r11), the default
  empty string covers permissions-only files, and a WRONG password
  keeps the honest ``encrypted`` flag;
- text operators: BT/ET blocks, Tj, ' , " and TJ array shows, Td/TD/T*
  line moves (emitted as newlines);
- string syntax: literal ``( … )`` with all escape forms (octal,
  ``\\n`` etc., nested parens, line continuations) and hex ``< … >``;
- single-byte font encodings are passed through as latin-1;
- CID/Type0 composite fonts with an embedded ToUnicode CMap (the
  modern machine-generated case: Identity-H two-byte codes, bfchar /
  bfrange sections, Flate-compressed CMap streams). Font resource
  names (``/F1 12 Tf``) select the decoder per show string.

Out of scope (documented seams — the flags tell the caller): Type0
fonts WITHOUT a usable ToUnicode CMap (flag ``cid_font``; codes that a
present CMap doesn't cover flag ``cid_unmapped``), documents whose
password the caller doesn't have (``encrypted``), DCT/JBIG2/CCITT
image filters (``unsupported_filter``), Type3 glyph drawing.
``extract_pdf_text`` returns (text, n_pages, flags) where flags carries
``cid_font`` / ``encrypted`` / ``unsupported_filter`` / ``truncated``
markers instead of
silently emitting garbage.

``encode_simple_pdf`` writes a minimal valid single-font PDF (fixture
and sink side) so the extractor faces a REAL Flate + escape round-trip
in tests and in the q_pdf_text oracle gate.

The Spark surface is :func:`pdf_text` — Arrow ``mapInPandas`` over a
binary payload column, the same kernel shape as the image codecs.

Reference parity note: the reference (datapump.py) has no document
parsing; this extends the engine for training-data pipelines per the
build charter.
"""

from __future__ import annotations

import functools
import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# fallback only (no direct /Length): GREEDY to the object's last
# endstream — the body already ends at endobj
_STREAM_FALLBACK_RE = re.compile(rb"stream\r?\n(.*)\r?\nendstream", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def _stream_data(body: bytes) -> bytes | None:
    """Extract a stream's exact bytes. The spec's /Length is
    authoritative — a regex scanning for ``endstream`` would truncate
    one byte whenever the (compressed) data happens to END with 0x0D,
    because the EOL before the keyword is optional-\\r ambiguous."""
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return None
    head = body[:sm.start()]
    lm = _LENGTH_RE.search(head)
    if lm:
        start = sm.end()
        return body[start:start + int(lm.group(1))]
    fm = _STREAM_FALLBACK_RE.search(body)
    return fm.group(1) if fm else None

def lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF/TIFF-variant LZW (PDF 32000-1 §7.4.4): MSB-first bit
    packing, 9→12-bit codes, 256 = Clear, 257 = EOD; ``early``
    (/EarlyChange, default 1) advances the code width one entry
    early."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == 256:             # Clear
                table = {i: bytes([i]) for i in range(256)}
                next_code, width = 258, 9
                prev = None
                continue
            if code == 257:             # EOD
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("corrupt LZW stream")
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Greedy LZW encoder mirroring :func:`lzw_decode`'s width
    schedule — fixture/sink side."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)                    # leading Clear (conventional)
    w = b""
    for i in range(len(data)):
        c = w + data[i:i + 1]
        if c in table:
            w = c
            continue
        emit(table[w], width)
        table[c] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by ONE entry (it adds
        # on the NEXT code), so the encoder's width bump fires one
        # entry later than the decoder's `next_code + early >= 2^w`
        if next_code + early - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code == 4096:           # table full: reset
            emit(256, width)
            table = {bytes([j]): j for j in range(256)}
            next_code, width = 258, 9
        w = data[i:i + 1]
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Standard security handler (PDF 32000-1 §7.6.3 / ISO 32000-2 §7.6.4):
# RC4 V1/V2 R2/R3, AES-128 V4/R4, AES-256 V5/R5-6; empty OR
# caller-supplied user/owner passwords (r10). A wrong password stays
# flagged 'encrypted'.
# --------------------------------------------------------------------------

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = ch ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    """Algorithm 2 step a: pad/truncate a password to 32 bytes with
    the standard padding string."""
    return (pw + _PAD)[:32]


def _std_file_key(owner: bytes, p: int, id0: bytes, r: int,
                  n: int, meta_clear: bool = False,
                  padded_user: bytes = _PAD) -> bytes:
    """Algorithm 2: the file key from the (padded) USER password (RC4
    and AESV2 share it; R4 with /EncryptMetadata false appends the
    ffffffff sentinel). Default = the empty-password padding."""
    import hashlib
    tail = b"\xff\xff\xff\xff" if (r >= 4 and meta_clear) else b""
    h = hashlib.md5(padded_user + owner
                    + (p & 0xFFFFFFFF).to_bytes(4, "little")
                    + id0 + tail).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _std_user_check(key: bytes, r: int, id0: bytes) -> bytes:
    """Algorithms 4/5: the /U value an empty user password produces."""
    import hashlib
    if r == 2:
        return _rc4(key, _PAD)
    x = hashlib.md5(_PAD + id0).digest()
    x = _rc4(key, x)
    for i in range(1, 20):
        x = _rc4(bytes(kb ^ i for kb in key), x)
    return x


@functools.lru_cache(maxsize=256)
def _hash_2b(pw: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """PDF 2.0 password hash (ISO 32000-2 Algorithm 2.B, round 9).
    R 5 is a plain SHA-256; R 6 iterates an AES-128-CBC mix whose
    first-16-byte sum picks SHA-256/384/512 per round, stopping after
    round 64 once the last cipher byte is <= rounds - 32. Memoized:
    a corpus encrypted by one producer repeats the same (salt,
    password) pairs across thousands of files, and the R6 iteration
    is ~0.2 s — per-worker-process, each distinct pair costs once."""
    import hashlib

    from datapump_spark.operators.aes import aes_cbc_encrypt_nopad

    k = hashlib.sha256(pw + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k1, k[:16], k[16:32])
        k = {0: hashlib.sha256, 1: hashlib.sha384,
             2: hashlib.sha512}[sum(e[:16]) % 3](e).digest()
        i += 1
    return k[:32]


def _v5_file_key(pw: bytes, u_val: bytes, ue_val: bytes,
                 r: int) -> bytes | None:
    """Algorithms 2.A / 8 for the USER password: validate ``pw``
    against /U (48 bytes: hash + validation salt + key salt) and
    unwrap the 32-byte file key from /UE — None when the password
    does not validate."""
    from datapump_spark.operators.aes import aes_cbc_decrypt

    if len(u_val) < 48 or len(ue_val) < 32:
        return None
    if _hash_2b(pw, u_val[32:40], b"", r) != u_val[:32]:
        return None
    inter = _hash_2b(pw, u_val[40:48], b"", r)
    return aes_cbc_decrypt(ue_val[:32], inter, iv=b"\x00" * 16,
                           unpad=False)


def _v5_owner_key(pw: bytes, o_val: bytes, oe_val: bytes, u_val: bytes,
                  r: int) -> bytes | None:
    """Algorithm 2.A for the OWNER password (r10): the owner hash
    salts /O with the full 48-byte /U value as extra user data; the
    file key unwraps from /OE."""
    from datapump_spark.operators.aes import aes_cbc_decrypt

    if len(o_val) < 48 or len(oe_val) < 32 or len(u_val) < 48:
        return None
    if _hash_2b(pw, o_val[32:40], u_val[:48], r) != o_val[:32]:
        return None
    inter = _hash_2b(pw, o_val[40:48], u_val[:48], r)
    return aes_cbc_decrypt(oe_val[:32], inter, iv=b"\x00" * 16,
                           unpad=False)


def _std_owner_key(r: int, n: int, owner_pw: bytes = b"",
                   user_pw: bytes = b"") -> bytes:
    """Algorithm 3 steps a-d: the RC4 key derived from the owner
    password (falling back to the user password when absent)."""
    import hashlib
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    return h[:n]


def _std_owner_value(r: int, n: int, owner_pw: bytes = b"",
                     user_pw: bytes = b"") -> bytes:
    """Algorithm 3: the /O value (the padded user password encrypted
    under the owner-derived RC4 key)."""
    key = _std_owner_key(r, n, owner_pw, user_pw)
    o = _rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(kb ^ i for kb in key), o)
    return o


def _std_user_pw_from_owner(r: int, n: int, owner_pw: bytes,
                            o_val: bytes) -> bytes:
    """Algorithm 7 steps a-b (r10): recover the PADDED user password
    from /O with the owner password."""
    key = _std_owner_key(r, n, owner_pw)
    if r == 2:
        return _rc4(key, o_val)
    u = o_val
    for i in range(19, -1, -1):
        u = _rc4(bytes(kb ^ i for kb in key), u)
    return u


class _StdDecryptor:
    """Per-object decryption (Algorithm 1): RC4, or AES-128-CBC for
    /CFM /AESV2 (round 9 — the object key gains the 'sAlT' suffix and
    the stream's first 16 bytes are the IV, PKCS#7-padded). V5
    (/AESV3, round 9) uses the 32-byte file key DIRECTLY — ISO
    32000-2 dropped per-object key derivation."""

    __slots__ = ("key", "aes", "v5")

    def __init__(self, key: bytes, aes: bool = False, v5: bool = False):
        self.key = key
        self.aes = aes or v5
        self.v5 = v5

    def _objkey(self, num: int, gen: int) -> bytes:
        import hashlib
        if self.v5:
            return self.key
        salt = b"sAlT" if self.aes else b""
        ok = hashlib.md5(self.key + num.to_bytes(3, "little")
                         + gen.to_bytes(2, "little") + salt).digest()
        return ok[:min(len(self.key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.aes:
            from datapump_spark.operators.aes import aes_cbc_decrypt
            return aes_cbc_decrypt(data, self._objkey(num, gen))
        return _rc4(self._objkey(num, gen), data)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        """Fixture-writer twin (RC4 is symmetric; AES pads + prepends
        a deterministic object-derived IV)."""
        if self.aes:
            import hashlib

            from datapump_spark.operators.aes import aes_cbc_encrypt
            iv = hashlib.md5(b"iv" + num.to_bytes(3, "little")).digest()
            return aes_cbc_encrypt(data, self._objkey(num, gen), iv)
        return _rc4(self._objkey(num, gen), data)


def _parse_pdf_bytestring(body: bytes, at: int) -> bytes | None:
    """Parse a hex ``<...>`` or literal ``(...)`` string starting at
    ``at`` into raw BYTES (the /O //U /ID values are binary)."""
    while at < len(body) and body[at] in b" \t\r\n":
        at += 1
    if at >= len(body):
        return None
    if body[at] == ord("<"):
        j = body.find(b">", at + 1)
        if j < 0:
            return None
        hx = re.sub(rb"\s", b"", body[at + 1:j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    if body[at] == ord("("):
        s, _ = _parse_literal_string(body, at)
        return s.encode("latin-1", errors="replace")
    return None


def _try_standard_decrypt(b: bytes, objs: dict[int, bytes],
                          password: bytes = b"",
                          password_v5: bytes | None = None,
                          ) -> _StdDecryptor | None:
    """Resolve the /Encrypt dict; if it is the Standard handler with
    RC4 (V 1/2, R 2/3), AES-128 (V 4 / R 4 with /CFM /AESV2, r9) or
    AES-256 (V 5 / R 5-6 with /CFM /AESV3, r9 — the PDF 2.0 scheme,
    SHA-2 family hash per Algorithm 2.B) and ``password`` validates —
    tried as the USER password, then as the OWNER password (Algorithm
    7 / the /OE unwrap, r10); the default empty string covers the
    common permissions-only case — return a decryptor, else None
    (stays flagged 'encrypted'). ``password_v5`` (r11) is the UTF-8
    form used by the V5 hash (Algorithm 2.A hashes UTF-8, not the
    legacy latin-1 padding); it defaults to ``password``."""
    if password_v5 is None:
        password_v5 = password
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", b)
    enc = objs.get(int(em.group(1))) if em else None
    if enc is None:
        return None
    if not re.search(rb"/Filter\s*/Standard\b", enc):
        return None
    vm = re.search(rb"/V\s+(\d+)", enc)
    rm = re.search(rb"/R\s+(\d+)", enc)
    pm = re.search(rb"/P\s+(-?\d+)", enc)
    lm = re.search(rb"/Length\s+(\d+)", enc)
    om = re.search(rb"/O\s*", enc)
    um = re.search(rb"/U\s*", enc)
    if not (vm and rm and pm and om and um):
        return None
    v, r, p = int(vm.group(1)), int(rm.group(1)), int(pm.group(1))
    if v == 5 and r in (5, 6):
        # PDF 2.0: AES-256, file key unwrapped from /UE after the
        # empty user password validates via the 2.B hash
        if not re.search(rb"/CFM\s*/AESV3\b", enc):
            return None
        uem = re.search(rb"/UE\s*", enc)
        oem = re.search(rb"/OE\s*", enc)
        u_val = _parse_pdf_bytestring(enc, um.end())
        ue_val = _parse_pdf_bytestring(enc, uem.end()) if uem else None
        if u_val is None or ue_val is None:
            return None
        key = _v5_file_key(password_v5, u_val, ue_val, r)
        if key is None and oem is not None:
            # owner-password path: /O salts with the /U value, the
            # file key unwraps from /OE (r10)
            o_val48 = _parse_pdf_bytestring(enc, om.end())
            oe_val = _parse_pdf_bytestring(enc, oem.end())
            if o_val48 is not None and oe_val is not None:
                key = _v5_owner_key(password_v5, o_val48, oe_val,
                                    u_val, r)
        if key is None:
            return None                 # the real password differs
        return _StdDecryptor(key, v5=True)
    aes = False
    if v == 4 and r == 4:
        # crypt-filter dispatch: only the AESV2 StdCF stream filter
        # is in scope (V2-in-a-CF would also be decodable but is rare
        # enough to leave flagged)
        if not re.search(rb"/CFM\s*/AESV2\b", enc):
            return None
        aes = True
    elif v not in (1, 2) or r not in (2, 3):
        return None                     # unknown scheme stays flagged
    n = (int(lm.group(1)) // 8) if (lm and v >= 2) else 5
    if aes:
        n = 16                          # AESV2 is AES-128
    o_val = _parse_pdf_bytestring(enc, om.end())
    u_val = _parse_pdf_bytestring(enc, um.end())
    idm = re.search(rb"/ID\s*\[", b)
    id0 = _parse_pdf_bytestring(b, idm.end()) if idm else b""
    if o_val is None or u_val is None or id0 is None:
        return None
    meta_clear = re.search(rb"/EncryptMetadata\s+false", enc) is not None

    def _user_attempt(padded: bytes) -> _StdDecryptor | None:
        key = _std_file_key(o_val, p, id0, r, n, meta_clear, padded)
        want = _std_user_check(key, r, id0)
        got = u_val[:16] if r >= 3 else u_val
        if want[:len(got)] != got:
            return None
        return _StdDecryptor(key, aes)

    dec = _user_attempt(_pad_pw(password))
    if dec is None:
        # owner-password path (Algorithm 7, r10): recover the padded
        # user password from /O and retry — also covers files with a
        # user password but an EMPTY owner password
        dec = _user_attempt(_std_user_pw_from_owner(r, n, password,
                                                    o_val))
    return dec


def _decrypt_streams_in_place(b: bytes, dec: _StdDecryptor) -> bytes:
    """Decrypt every stream's bytes at their absolute offsets. RC4
    preserves length, so the layout stays valid untouched. AES output
    is SHORTER (16-byte IV + PKCS#7 padding removed): the gap is
    space-padded (whitespace before ``endstream`` is legal) and the
    direct /Length value is rewritten in place, space-padded to its
    original digit width so no offset moves — the object-scan parser
    runs unchanged either way. The parser never follows xref offsets,
    so in-place is safe by construction."""
    out = bytearray(b)
    for m in _OBJ_RE.finditer(b):
        num, gen = int(m.group(1)), int(m.group(2))
        body = m.group(3)
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            continue
        head = body[:sm.start()]
        start = m.start(3) + sm.end()
        lm = _LENGTH_RE.search(head)
        if lm:
            length = int(lm.group(1))
        else:
            fm = _STREAM_FALLBACK_RE.search(body)
            if not fm:
                continue
            start = m.start(3) + fm.start(1)
            length = len(fm.group(1))
        length = min(length, len(b) - start)
        try:
            plain = dec.decrypt(num, gen, b[start:start + length])
        except ValueError:
            continue                    # bad padding: leave untouched
        out[start:start + len(plain)] = plain
        if len(plain) < length:
            out[start + len(plain):start + length] = \
                b" " * (length - len(plain))
            if lm:                      # keep /Length honest, same width
                digits = str(len(plain)).encode()
                span = lm.end(1) - lm.start(1)
                if len(digits) <= span:
                    at = m.start(3) + lm.start(1)
                    out[at:at + span] = digits.ljust(span)
    return bytes(out)


def _expand_object_streams(
        objs: dict[int, bytes]) -> tuple[dict[int, bytes], set[str]]:
    """PDF 32000-1 §7.5.7: objects of /Type /ObjStm hold N wrapper-less
    objects (never streams) — ``N`` pairs of "objnum offset" before
    /First, bodies after. Returns (embedded objnum → body, flags).
    Without this, the dicts of a modern xref-stream PDF (pages, fonts,
    ToUnicode refs) are invisible to the object scan."""
    extra: dict[int, bytes] = {}
    flags: set[str] = set()
    for body in objs.values():
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            continue
        head = body[:sm.start()]
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        data = _stream_data(body)
        if nm is None or fm is None or data is None:
            flags.add("truncated")
            continue
        data = _defilter(head, data)
        if data is None:
            flags.add("unsupported_filter")
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        pairs = []
        for i in range(min(n, len(header) // 2)):
            try:
                pairs.append((int(header[2 * i]), int(header[2 * i + 1])))
            except ValueError:
                break
        ends = [off for _, off in pairs[1:]] + [len(data) - first]
        for (num, off), end in zip(pairs, ends):
            extra[num] = data[first + off:first + end]
        if len(pairs) < n:
            flags.add("truncated")
    return extra, flags


def _early_change(head: bytes) -> int:
    m = re.search(rb"/EarlyChange\s+(\d+)", head)
    return int(m.group(1)) if m else 1


def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    hx = re.sub(rb"\s", b"", data[:end if end >= 0 else len(data)])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64
    end = data.find(b"~>")
    body = re.sub(rb"\s", b"", data[:end if end >= 0 else len(data)])
    return base64.a85decode(body)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        ln = data[i]
        i += 1
        if ln == 128:                   # EOD
            break
        if ln < 128:
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            if i >= len(data):
                raise ValueError("truncated RunLength stream")
            out += data[i:i + 1] * (257 - ln)
            i += 1
    return bytes(out)


_FILTER_VALUE_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _defilter(head: bytes, data: bytes) -> bytes | None:
    """Apply the stream dict's /Filter — a single name or an ARRAY
    chain, applied in order (PDF 32000-1 §7.4). Supported: Flate, LZW
    (incl. /EarlyChange), ASCIIHex, ASCII85, RunLength. None =
    unsupported filter or corrupt data — the caller flags it."""
    fm = _FILTER_VALUE_RE.search(head)
    if fm is None:
        return data if not re.search(rb"/Filter", head) else None
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    for name in names:
        try:
            if name in (b"FlateDecode", b"Fl"):
                data = zlib.decompress(data)
            elif name in (b"LZWDecode", b"LZW"):
                data = lzw_decode(data, _early_change(head))
            elif name in (b"ASCIIHexDecode", b"AHx"):
                data = _ascii_hex_decode(data)
            elif name in (b"ASCII85Decode", b"A85"):
                data = _ascii85_decode(data)
            elif name in (b"RunLengthDecode", b"RL"):
                data = _run_length_decode(data)
            else:
                return None             # DCT/JBIG2/CCITT/Crypt: image land
        except (ValueError, zlib.error):
            return None
    return data


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at the '(' byte; returns
    (decoded text, index past ')')."""
    assert data[i] == ord("(")
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n:
        c = data[i]
        if c == ord("\\"):
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif ord("0") <= e <= ord("7"):
                oct_digits = chr(e)
                i += 1
                while (i < n and len(oct_digits) < 3
                       and ord("0") <= data[i] <= ord("7")):
                    oct_digits += chr(data[i])
                    i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):
                # line continuation: swallow the EOL (and CRLF pair)
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
            continue
        if c == ord("("):
            depth += 1
        elif c == ord(")"):
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        elif c == 0x0D:
            # unescaped EOL inside a literal is \n, CRLF collapsing to
            # one (PDF 7.3.4.2)
            out.append("\n")
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
            continue
        out.append(chr(c))
        i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    assert data[i] == ord("<")
    j = data.index(b">", i + 1)
    hx = re.sub(rb"\s", b"", data[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1


class _CMap:
    """ToUnicode character map: raw code bytes → unicode text.
    ``code_lens`` (from the codespace ranges / observed key widths)
    drives a shortest-match-first walk; codes the map doesn't cover
    count in ``unmapped`` so the caller can flag instead of emitting
    garbage."""

    __slots__ = ("mapping", "code_lens", "unmapped")

    def __init__(self, mapping: dict[bytes, str], code_lens) -> None:
        self.mapping = mapping
        self.code_lens = sorted(set(code_lens) or {2})
        self.unmapped = 0

    def decode(self, raw: bytes) -> str:
        out: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            for width in self.code_lens:
                chunk = raw[i:i + width]
                if len(chunk) == width and chunk in self.mapping:
                    out.append(self.mapping[chunk])
                    i += width
                    break
            else:
                self.unmapped += 1
                i += self.code_lens[0]
        return "".join(out)


_CS_RANGE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange",
                          re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_TOK_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\[|\]")


def _unhex(tok: bytes) -> bytes:
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _utf16_text(tok: bytes) -> str:
    db = _unhex(tok)
    if len(db) % 2:             # ToUnicode dsts are UTF-16BE code units
        db += b"\x00"
    return db.decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes) -> _CMap:
    """Parse a ToUnicode CMap stream's bfchar/bfrange sections (PDF
    9.10.3; CMap syntax from Adobe CMap/CIDFont spec §7.2)."""
    mapping: dict[bytes, str] = {}
    code_lens: set[int] = set()
    for m in _CS_RANGE_RE.finditer(data):
        for tok in _CMAP_TOK_RE.findall(m.group(1)):
            if tok not in (b"[", b"]"):
                code_lens.add(len(_unhex(tok)))
    for m in _BFCHAR_RE.finditer(data):
        toks = [t for t in _CMAP_TOK_RE.findall(m.group(1))
                if t not in (b"[", b"]")]
        for src, dst in zip(toks[0::2], toks[1::2]):
            sb = _unhex(src)
            mapping[sb] = _utf16_text(dst)
            code_lens.add(len(sb))
    for m in _BFRANGE_RE.finditer(data):
        toks = _CMAP_TOK_RE.findall(m.group(1))
        i, n = 0, len(toks)
        while i + 2 < n or (i + 2 == n and toks[i] not in (b"[", b"]")):
            lo_b, hi_b = _unhex(toks[i]), _unhex(toks[i + 1])
            lo = int.from_bytes(lo_b, "big")
            hi = int.from_bytes(hi_b, "big")
            width = len(lo_b)
            code_lens.add(width)
            if hi - lo > 0xFFFF:        # corrupt range — refuse the bomb
                hi = lo + 0xFFFF
            if i + 2 >= n:              # truncated range: keep what parsed
                break
            if toks[i + 2] == b"[":
                j = i + 3
                code = lo
                while j < n and toks[j] != b"]":
                    mapping[code.to_bytes(width, "big")] = (
                        _utf16_text(toks[j]))
                    code += 1
                    j += 1
                i = j + 1
            else:
                dst_b = _unhex(toks[i + 2])
                base = int.from_bytes(dst_b, "big")
                for code in range(lo, hi + 1):
                    db = (base + code - lo).to_bytes(len(dst_b), "big")
                    mapping[code.to_bytes(width, "big")] = (
                        db.decode("utf-16-be", errors="replace"))
                i += 3
    return _CMap(mapping, code_lens)


_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_RES_IND_RE = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_FONT_REF_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")


def _build_type0_fonts(objs: dict[int, bytes]) -> tuple[dict, int]:
    """(font resource name → _CMap, count of Type0 fonts with no usable
    ToUnicode). Resource names are collected globally across all /Font
    dicts; a name bound to two different font objects is ambiguous and
    counts as undecoded rather than guessing."""
    name2obj: dict[str, int] = {}
    ambiguous: set[str] = set()
    font_dicts: list[bytes] = []
    for body in objs.values():
        sm = _STREAM_START_RE.search(body)
        head = body if sm is None else body[:sm.start()]
        for fm in _FONT_RES_IND_RE.finditer(head):
            ref = objs.get(int(fm.group(1)))
            if ref is not None:
                font_dicts.append(ref)
        font_dicts.extend(m.group(1) for m in _FONT_RES_RE.finditer(head))
    for fd in font_dicts:
        for nm_b, num_b in _FONT_REF_RE.findall(fd):
            nm, num = nm_b.decode("latin-1"), int(num_b)
            if name2obj.get(nm, num) != num:
                ambiguous.add(nm)
            name2obj[nm] = num

    fonts: dict[str, _CMap] = {}
    undecoded = 0
    for nm, num in name2obj.items():
        fbody = objs.get(num)
        if fbody is None or not re.search(rb"/Type0\b", fbody):
            continue
        cmap = None
        tm = _TOUNICODE_RE.search(fbody)
        if tm and nm not in ambiguous:
            tobj = objs.get(int(tm.group(1)))
            if tobj is not None:
                data = _stream_data(tobj)
                if data is not None:
                    tsm = _STREAM_START_RE.search(tobj)
                    thead = tobj[:tsm.start()] if tsm else tobj
                    data = _defilter(thead, data)
                    if data is not None:
                        cmap = _parse_tounicode(data)
        if cmap is None or not cmap.mapping:
            undecoded += 1
        else:
            fonts[nm] = cmap
    return fonts, undecoded


def _content_text(content: bytes, fonts: dict | None = None) -> str:
    """Walk a content stream's text operators. Shows within one line
    concatenate; Td/TD/T*/'/" line moves emit newlines. ``fonts`` maps
    resource names to Type0 _CMap decoders: a ``/Name size Tf`` whose
    name is in the map routes subsequent show strings through CID
    decoding; any other font is single-byte latin-1 passthrough."""
    out: list[str] = []
    i, n = 0, len(content)
    in_text = False
    pending_strings: list[str] = []
    last_name: str | None = None
    cur: _CMap | None = None

    def show(s: str) -> str:
        if cur is None:
            return s
        return cur.decode(s.encode("latin-1"))

    def flush_op(op: bytes) -> None:
        nonlocal pending_strings, cur
        if op == b"Tf":
            cur = fonts.get(last_name) if fonts else None
            pending_strings = []
            return
        if not in_text:
            pending_strings = []
            return
        if op == b"Tj":
            out.append(show(pending_strings[-1]) if pending_strings else "")
        elif op == b"TJ":
            out.append("".join(show(s) for s in pending_strings))
        elif op in (b"'", b'"'):
            if out:
                out.append("\n")
            out.append(show(pending_strings[-1]) if pending_strings else "")
        elif op in (b"Td", b"TD", b"T*"):
            # a line move BEFORE any show is positioning, not a blank line
            if out:
                out.append("\n")
        pending_strings = []

    while i < n:
        c = content[i]
        if c == ord("("):
            s, i = _parse_literal_string(content, i)
            pending_strings.append(s)
            continue
        if c == ord("<"):
            if i + 1 < n and content[i + 1] == ord("<"):
                i += 2          # dictionary — skip the delimiters
                continue
            s, i = _parse_hex_string(content, i)
            pending_strings.append(s)
            continue
        if c == ord("/"):       # name token (e.g. the Tf font operand)
            m = re.match(rb"/([^\s/<>\[\]()%]*)", content[i:])
            last_name = m.group(1).decode("latin-1")
            i += m.end()
            continue
        if c == ord("%"):       # comment to EOL
            while i < n and content[i] not in (0x0A, 0x0D):
                i += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 8])
        if m:
            op = m.group(0)
            if op == b"BT":
                in_text = True
                pending_strings = []
            elif op == b"ET":
                in_text = False
            else:
                flush_op(op)
            i += len(op)
            continue
        i += 1
    # a trailing line move (the writer's per-line Td) is positioning too
    return "".join(out).rstrip("\n")


def extract_pdf_text(b: bytes,
                     password: str | bytes = "") -> tuple[str, int, list[str]]:
    """(text, n_pages, flags). Flags: 'encrypted', 'cid_font' (a Type0
    font with no usable ToUnicode CMap), 'cid_unmapped' (a CMap was
    present but some codes fell outside it), 'unsupported_filter' —
    present when part of the document is outside scope (the extracted
    text covers what IS in scope). ``password`` (r10) is tried as the
    user then the owner password; the default empty string covers the
    common permissions-only encryption. A str password is encoded two
    ways (r11): latin-1 for the legacy padded-password algorithms
    (R 2-4, Algorithm 2 pads BYTES), and NFKC-normalized UTF-8
    truncated to 127 bytes for V5/R5-6, where ISO 32000-2 Algorithm
    2.A hashes the SASLprep'd UTF-8 password — NFKC is SASLprep's
    normalization step, and its mapping/prohibited-code steps are
    no-ops for passwords without control or deprecated codepoints."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    if isinstance(password, str):
        import unicodedata
        pw_v5 = unicodedata.normalize(
            "NFKC", password).encode("utf-8")[:127]
        password = password.encode("latin-1", errors="replace")
    else:
        pw_v5 = password[:127]
    flags: set[str] = set()

    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(b):
        objs[int(m.group(1))] = m.group(3)

    if re.search(rb"/Encrypt\b", b):
        dec = _try_standard_decrypt(b, objs, password, pw_v5)
        if dec is None:
            flags.add("encrypted")     # real password / AESV3: honest
        else:
            flags.add("decrypted")     # empty-password RC4/AESV2: read
            b = _decrypt_streams_in_place(b, dec)
            objs = {int(m.group(1)): m.group(3)
                    for m in _OBJ_RE.finditer(b)}

    embedded, stm_flags = _expand_object_streams(objs)
    flags |= stm_flags
    # top-level definitions win over ObjStm copies (spec: one or the
    # other; damaged files may carry both)
    merged = {**embedded, **objs}
    fonts, undecoded = _build_type0_fonts(merged)
    if undecoded or (not fonts
                     and re.search(rb"/Type0\b|/Identity-H\b", b)):
        flags.add("cid_font")

    # pages declared inside object streams are counted here; top-level
    # page dicts are counted in the scan below
    n_pages = sum(len(re.findall(rb"/Type\s*/Page(?![A-Za-z])", body))
                  for body in embedded.values())
    texts: list[str] = []
    for m in _OBJ_RE.finditer(b):
        body = m.group(3)
        sm = _STREAM_START_RE.search(body)
        head = body if sm is None else body[:sm.start()]
        # count pages from object DICTS only — never from stream bytes,
        # where a document ABOUT pdf syntax would inflate the count
        n_pages += len(re.findall(rb"/Type\s*/Page(?![A-Za-z])", head))
        if sm is None:
            continue
        data = _stream_data(body)
        lm = _LENGTH_RE.search(head)
        if lm and data is not None and len(data) < int(lm.group(1)):
            # the object scan cut at 'endobj' BYTES inside the stream —
            # re-slice at absolute offsets from the full buffer, and say
            # so if the file really ends early
            start = m.start(3) + sm.end()
            data = b[start:start + int(lm.group(1))]
            if len(data) < int(lm.group(1)):
                flags.add("truncated")
        if data is None:
            continue
        data = _defilter(head, data)
        if data is None:
            flags.add("unsupported_filter")
            continue
        # content streams contain text operators; other streams
        # (fonts, images, xref streams) simply yield nothing
        if b"BT" in data:
            texts.append(_content_text(data, fonts))

    # a file cut mid-object has NO trailing 'endobj', so the scan above
    # never sees its last object at all — detect it, flag, and salvage
    # whatever Flate can inflate of the partial stream
    last_end = max((m.end() for m in _OBJ_RE.finditer(b)), default=0)
    hm = re.search(rb"(\d+)\s+(\d+)\s+obj\b", b[last_end:])
    if hm:
        tail = b[last_end:]
        flags.add("truncated")
        sm = _STREAM_START_RE.search(tail, hm.end())
        if sm:
            head = tail[hm.end():sm.start()]
            n_pages += len(re.findall(rb"/Type\s*/Page(?![A-Za-z])", head))
            data = tail[sm.end():]
            if re.search(rb"/FlateDecode\b", head):
                try:
                    # decompressobj tolerates truncation (yields the
                    # prefix); genuinely corrupt bytes still raise
                    data = zlib.decompressobj().decompress(data)
                except zlib.error:
                    data = b""
            elif re.search(rb"/LZWDecode\b", head):
                try:
                    # lzw_decode yields the prefix when data runs out
                    data = lzw_decode(data, _early_change(head))
                except ValueError:
                    data = b""
            elif re.search(rb"/Filter", head):
                data = b""
            if b"BT" in data:
                texts.append(_content_text(data, fonts))
    if any(cm.unmapped for cm in fonts.values()):
        flags.add("cid_unmapped")
    return "\n".join(t for t in texts if t), n_pages, sorted(flags)


# --------------------------------------------------------------------------
# Minimal writer (fixtures, sink side)
# --------------------------------------------------------------------------

def _pdf_escape(s: str) -> bytes:
    out = s.encode("latin-1", errors="replace")
    return (out.replace(b"\\", rb"\\").replace(b"(", rb"\(")
            .replace(b")", rb"\)").replace(b"\r", rb"\r")
            .replace(b"\n", rb"\n"))


def _run_length_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:                       # run of 2..128 identical bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:
            k = i
            while k < n and k - i < 128:
                if k < n - 2 and data[k] == data[k + 1] == data[k + 2]:
                    break
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    out.append(128)                     # EOD
    return bytes(out)


def _assemble_pdf(objs: list[bytes], trailer_extra: bytes = b"") -> bytes:
    """Serialize numbered objects + classic xref + trailer (shared by
    every fixture writer; /Root is always object 1)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R" + trailer_extra + b" >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def encode_simple_pdf(text: str, compress: bool = True,
                      method: str = "flate") -> bytes:
    """One-page Helvetica PDF showing ``text`` (lines become Td moves),
    valid xref table. ``method`` picks the content-stream filter:
    'flate' (default), 'lzw', 'rle', or the chain 'a85+flate'
    (ASCII85-armored zlib — exercises /Filter arrays)."""
    shows = b"\n".join(
        b"(" + _pdf_escape(line) + b") Tj 0 -14 Td"
        for line in text.split("\n")) or b"() Tj"
    content = b"BT /F1 12 Tf 50 780 Td " + shows + b" ET"
    filt = b""
    if compress:
        if method == "lzw":
            content = lzw_encode(content)
            filt = b"/Filter /LZWDecode "
        elif method == "rle":
            content = _run_length_encode(content)
            filt = b"/Filter /RunLengthDecode "
        elif method == "a85+flate":
            import base64
            content = base64.a85encode(zlib.compress(content)) + b"~>"
            filt = b"/Filter [/ASCII85Decode /FlateDecode] "
        else:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _assemble_pdf(objs)


def encode_cid_pdf(text: str, compress: bool = True) -> bytes:
    """One-page Type0/Identity-H PDF showing ``text`` through 2-byte
    CIDs and an embedded ToUnicode CMap — the modern machine-generated
    layout. Printable ASCII rides a bfrange identity window
    (``<0020> <007E> <0020>``); every other character gets a bfchar
    entry at a code ≥0x0100 whose value DIFFERS from its unicode, so
    extraction proves the CMap is actually applied (a latin-1
    passthrough would come back as control bytes, not text). The CMap
    stream is Flate-compressed by default."""
    others = sorted({ch for ch in text
                     if not 0x20 <= ord(ch) <= 0x7E and ch != "\n"})
    code_of = {ch: 0x0100 + i for i, ch in enumerate(others)}

    def enc_line(line: str) -> bytes:
        hx = "".join(f"{code_of.get(ch, ord(ch)):04X}" for ch in line)
        return b"<" + hx.encode("ascii") + b">"

    shows = b"\n".join(enc_line(line) + b" Tj 0 -14 Td"
                       for line in text.split("\n")) or b"<> Tj"
    content = b"BT /F1 12 Tf 50 780 Td " + shows + b" ET"

    cmap = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
        b"begincmap\n/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n")
    if others:
        cmap += f"{len(others)} beginbfchar\n".encode("ascii")
        for ch in others:
            dst = ch.encode("utf-16-be").hex().upper()
            cmap += f"<{code_of[ch]:04X}> <{dst}>\n".encode("ascii")
        cmap += b"endbfchar\n"
    cmap += (b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
             b"end\nend")
    cmap = bytes(cmap)

    cfilt = mfilt = b""
    if compress:
        content = zlib.compress(content)
        cfilt = b"/Filter /FlateDecode "
        cmap = zlib.compress(cmap)
        mfilt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + cfilt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
        b"/ToUnicode 7 0 R >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
        b"/Synthetic-Identity /CIDSystemInfo << /Registry (Adobe) "
        b"/Ordering (Identity) /Supplement 0 >> /DW 1000 >>",
        b"<< " + mfilt + b"/Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream",
    ]
    return _assemble_pdf(objs)


def encode_objstm_pdf(text: str, filter_method: str = "flate") -> bytes:
    """One-page PDF with its catalog/pages/page/font DICTS packed into
    a compressed object stream (§7.5.7) — the modern xref-stream
    layout's object placement. The content stream stays top-level
    (streams cannot live inside an ObjStm). The object scan must
    expand the ObjStm to see the page dict (page count) at all."""
    shows = b"\n".join(
        b"(" + _pdf_escape(line) + b") Tj 0 -14 Td"
        for line in text.split("\n")) or b"() Tj"
    content = zlib.compress(b"BT /F1 12 Tf 50 780 Td " + shows + b" ET")

    inner = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R >>"),
        (6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    bodies = b""
    header = b""
    for num, body in inner:
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b"\n"
    stm = header + bodies
    first = len(header)
    if filter_method == "lzw":
        stm_enc, filt = lzw_encode(stm), b"/Filter /LZWDecode "
    else:
        stm_enc, filt = zlib.compress(stm), b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /ObjStm /N " + str(len(inner)).encode() + b" /First "
        + str(first).encode() + b" " + filt + b"/Length "
        + str(len(stm_enc)).encode() + b" >>\nstream\n" + stm_enc
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.5\n")
    out += b"1 0 obj\n" + objs[0] + b"\nendobj\n"
    out += (b"5 0 obj\n<< /Filter /FlateDecode /Length "
            + str(len(content)).encode() + b" >>\nstream\n" + content
            + b"\nendstream\nendobj\n")
    out += (b"trailer\n<< /Root 2 0 R >>\n%%EOF\n")
    return bytes(out)


def encode_encrypted_pdf(text: str, r: int = 3, user_pw: bytes = b"",
                         owner_pw: bytes = b"") -> bytes:
    """Standard-security-handler PDF (empty user AND owner passwords —
    the common permissions-only case). R=2 → RC4 V1 40-bit, R=3 → RC4
    V2 128-bit, R=4 → AES-128-CBC via /CF /StdCF /CFM /AESV2 (round
    9), R=5/6 → AES-256 /AESV3 (PDF 2.0, round 9: /U //O carry the
    2.B hash + salts, /UE //OE wrap the random file key). Streams are
    encrypted per Algorithm 1/1.A; the extractor must validate the
    password and decrypt. ``user_pw`` / ``owner_pw`` (r10) produce
    really-passworded fixtures; both default empty (the common
    permissions-only case)."""
    if r not in (2, 3, 4, 5, 6):
        raise ValueError("r must be 2, 3, 4, 5 or 6")
    p = -44
    id0 = bytes(range(16))

    if r >= 5:
        import hashlib

        from datapump_spark.operators.aes import (
            aes_cbc_encrypt_nopad,
            aes_encrypt_block,
        )
        key = hashlib.sha256(b"datapump fixture file key").digest()
        vsalt, ksalt = b"uVALsalt", b"uKEYsalt"
        ovsalt, oksalt = b"oVALsalt", b"oKEYsalt"
        zero_iv = b"\x00" * 16
        u_val = _hash_2b(user_pw, vsalt, b"", r) + vsalt + ksalt
        ue_val = aes_cbc_encrypt_nopad(
            key, _hash_2b(user_pw, ksalt, b"", r), zero_iv)
        o_val = _hash_2b(owner_pw, ovsalt, u_val, r) + ovsalt + oksalt
        oe_val = aes_cbc_encrypt_nopad(
            key, _hash_2b(owner_pw, oksalt, u_val, r), zero_iv)
        perms = aes_encrypt_block(
            (p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xffTadbfixp", key)
        dec = _StdDecryptor(key, v5=True)
    else:
        n = 5 if r == 2 else 16
        o_val = _std_owner_value(r, n, owner_pw, user_pw)
        key = _std_file_key(o_val, p, id0, r, n,
                            padded_user=_pad_pw(user_pw))
        u_val = _std_user_check(key, r, id0)
        if r >= 3:
            u_val = u_val + b"\x00" * 16  # U is 32 bytes; last 16 arbitrary
        dec = _StdDecryptor(key, aes=(r == 4))

    shows = b"\n".join(
        b"(" + _pdf_escape(line) + b") Tj 0 -14 Td"
        for line in text.split("\n")) or b"() Tj"
    content = zlib.compress(b"BT /F1 12 Tf 50 780 Td " + shows + b" ET")
    content = dec.encrypt(4, 0, content)    # encrypt obj 4's stream

    if r >= 5:
        enc_dict = (b"<< /Filter /Standard /V 5 /R " + str(r).encode()
                    + b" /Length 256"
                    + b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                    + b" /StmF /StdCF /StrF /StdCF"
                    + b" /P " + str(p).encode()
                    + b" /O <" + o_val.hex().encode() + b">"
                    + b" /OE <" + oe_val.hex().encode() + b">"
                    + b" /U <" + u_val.hex().encode() + b">"
                    + b" /UE <" + ue_val.hex().encode() + b">"
                    + b" /Perms <" + perms.hex().encode() + b"> >>")
    else:
        v = {2: 1, 3: 2, 4: 4}[r]
        enc_dict = (b"<< /Filter /Standard /V " + str(v).encode() + b" /R "
                    + str(r).encode()
                    + (b" /Length 128" if v >= 2 else b"")
                    + (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                       b" /StmF /StdCF /StrF /StdCF" if r == 4 else b"")
                    + b" /P " + str(p).encode()
                    + b" /O <" + o_val.hex().encode() + b">"
                    + b" /U <" + u_val.hex().encode() + b"> >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        enc_dict,
    ]
    return _assemble_pdf(objs, b" /Encrypt 6 0 R /ID [<"
                         + id0.hex().encode() + b"> <"
                         + id0.hex().encode() + b">]")


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_PDF_SCHEMA = ("media_id long, text string, n_chars int, n_pages int, "
               "flags array<string>")


def pdf_text(df, on_error: str = "null", passthrough: tuple = (),
             password: str = ""):
    """(media_id, text, n_chars, n_pages, flags[, passthrough…]) via
    Arrow mapInPandas over (media_id, payload). Same error contract as
    the image kernels: ``'null'`` drops undecodable payloads to null
    text, ``'raise'`` propagates. ``passthrough`` names string columns
    copied through the kernel — callers that need provenance (path,
    source) avoid a re-scan + shuffle join back onto the input.
    ``password`` (r10) is tried per payload as user then owner
    password; for per-source maps use document_text(passwords=...)."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")
    schema = _PDF_SCHEMA + "".join(f", {c} string" for c in passthrough)

    def kernel(batches):
        for pdf_batch in batches:
            texts, chars, pages, flags = [], [], [], []
            for payload in pdf_batch["payload"]:
                try:
                    t, np_, fl = extract_pdf_text(bytes(payload),
                                                  password)
                    texts.append(t)
                    chars.append(len(t))
                    pages.append(np_)
                    flags.append(fl)
                except Exception:
                    if on_error == "raise":
                        raise
                    texts.append(None)
                    chars.append(None)
                    pages.append(None)
                    flags.append(None)
            out = {
                "media_id": pdf_batch["media_id"], "text": texts,
                "n_chars": chars, "n_pages": pages, "flags": flags,
            }
            for c in passthrough:
                out[c] = pdf_batch[c]
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", *passthrough)         .mapInPandas(kernel, schema)
