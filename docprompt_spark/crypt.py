"""Encrypted-PDF support: the Standard security handler (PDF 32000-1 §7.6).

The reference opens encrypted PDFs through pdfium (``PdfDocument.password``,
reference schema/document.py:64); a 100 TB crawl corpus always contains
them. From scratch here:

* RC4 (the §7.6.2 stream cipher, 40- and 128-bit keys),
* AES-128 (FIPS-197; the S-box is *generated* from GF(2^8) inversion + the
  affine map rather than transcribed, so a typo is impossible), CBC mode
  with the §7.6.2 layout (16-byte IV prefix, PKCS#7 padding),
* the Standard handler's key algorithms (§7.6.3.3 Algorithms 1-5):
  /V1 /R2 RC4-40, /V2 /R3 RC4-128, /V4 /R4 AES-128 (/AESV2 crypt filter).

Verified two ways: round-trip through our own reader AND cross-checked
against the ``cryptography`` package's AES/ARC4 in tests (import-gated).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

# --------------------------------------------------------------------------
# RC4 (§7.6.2)
# --------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES-128 (FIPS-197), generated tables
# --------------------------------------------------------------------------


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _make_sbox():
    # multiplicative inverse in GF(2^8) then the affine transform
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        r = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            r |= bit << i
        sbox[x] = r
    return sbox


_SBOX = _make_sbox()
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes):
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return w


def _add_round_key(state, w, rnd):
    for c in range(4):
        for r in range(4):
            state[r][c] ^= w[4 * rnd + c][r]


def _encrypt_block(block: bytes, w) -> bytes:
    state = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(state, w, 0)
    for rnd in range(1, 10):
        state = [[_SBOX[b] for b in row] for row in state]
        for r in range(1, 4):
            state[r] = state[r][r:] + state[r][:r]
        ns = [[0] * 4 for _ in range(4)]
        for c in range(4):
            a = [state[r][c] for r in range(4)]
            ns[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
            ns[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
            ns[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
            ns[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
        state = ns
        _add_round_key(state, w, rnd)
    state = [[_SBOX[b] for b in row] for row in state]
    for r in range(1, 4):
        state[r] = state[r][r:] + state[r][:r]
    _add_round_key(state, w, 10)
    return bytes(state[r][c] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, w) -> bytes:
    state = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(state, w, 10)
    for rnd in range(9, 0, -1):
        for r in range(1, 4):
            state[r] = state[r][-r:] + state[r][:-r]
        state = [[_INV_SBOX[b] for b in row] for row in state]
        _add_round_key(state, w, rnd)
        ns = [[0] * 4 for _ in range(4)]
        for c in range(4):
            a = [state[r][c] for r in range(4)]
            ns[0][c] = _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
            ns[1][c] = _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
            ns[2][c] = _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
            ns[3][c] = _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
        state = ns
    for r in range(1, 4):
        state[r] = state[r][-r:] + state[r][:-r]
    state = [[_INV_SBOX[b] for b in row] for row in state]
    _add_round_key(state, w, 0)
    return bytes(state[r][c] for c in range(4) for r in range(4))


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with PKCS#7 padding; returns iv + ciphertext (PDF §7.6.2 AESV2
    layout)."""
    w = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, w)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AESV2 payload")
    w = _expand_key(key)
    iv, ct = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, w), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad AES padding")
    return bytes(out[:-pad])


# --------------------------------------------------------------------------
# Standard security handler (§7.6.3)
# --------------------------------------------------------------------------

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def compute_o(owner_pwd: bytes, user_pwd: bytes, rev: int, keylen: int) -> bytes:
    """Algorithm 3: the /O value."""
    h = hashlib.md5(_pad_pwd(owner_pwd or user_pwd)).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:keylen]
    o = rc4(key, _pad_pwd(user_pwd))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_key(
    user_pwd: bytes, o: bytes, p: int, id0: bytes, rev: int, keylen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    m = hashlib.md5()
    m.update(_pad_pwd(user_pwd))
    m.update(o[:32])
    m.update(struct.pack("<i", p))
    m.update(id0)
    if rev >= 4 and not encrypt_metadata:
        m.update(b"\xff\xff\xff\xff")
    h = m.digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


def compute_u(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithms 4/5: the /U value."""
    if rev == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key."""
    m = hashlib.md5()
    m.update(file_key)
    m.update(struct.pack("<I", num)[:3])
    m.update(struct.pack("<I", gen)[:2])
    if aes:
        m.update(b"sAlT")
    return m.digest()[: min(len(file_key) + 5, 16)]


_MODES = {
    # mode -> (V, R, key bytes, aes)
    "rc4-40": (1, 2, 5, False),
    "rc4-128": (2, 3, 16, False),
    "aes-128": (4, 4, 16, True),
}


class StdSecurityHandler:
    """Both sides of the Standard handler: the writer creates one with
    :meth:`create`; the reader with :meth:`from_encrypt_dict` (empty user
    password — the overwhelmingly common "owner-locked" crawl case)."""

    def __init__(self, key: bytes, aes: bool, v: int, r: int,
                 o: bytes, u: bytes, p: int) -> None:
        self.key, self.aes, self.v, self.r = key, aes, v, r
        self.o, self.u, self.p = o, u, p

    # -- writer side --------------------------------------------------------
    @classmethod
    def create(cls, mode: str, id0: bytes, user_pwd: bytes = b"",
               owner_pwd: bytes = b"owner", p: int = -3904) -> "StdSecurityHandler":
        v, r, klen, aes = _MODES[mode]
        o = compute_o(owner_pwd, user_pwd, r, klen)
        key = compute_key(user_pwd, o, p, id0, r, klen)
        u = compute_u(key, id0, r)
        return cls(key, aes, v, r, o, u, p)

    def encrypt_dict_body(self) -> str:
        from docprompt_spark.pdfwrite import esc_literal

        body = (
            f"<< /Filter /Standard /V {self.v} /R {self.r}"
            f" /Length {len(self.key) * 8} /P {self.p}"
        )
        if self.v == 4:
            body += (
                " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                " /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        body += (
            f" /O ({esc_literal(self.o).decode('latin-1')})"
            f" /U ({esc_literal(self.u).decode('latin-1')}) >>"
        )
        return body

    # -- reader side ----------------------------------------------------------
    @classmethod
    def from_encrypt_dict(
        cls, enc: dict, id0: bytes, resolve, password: bytes = b""
    ) -> "StdSecurityHandler":
        if str(resolve(enc.get("Filter", ""))) != "Standard":
            raise ValueError("unsupported security handler")
        v = int(resolve(enc.get("V", 0)) or 0)
        r = int(resolve(enc.get("R", 2)) or 2)
        klen = int(resolve(enc.get("Length", 40)) or 40) // 8
        if v == 1:
            klen = 5
        aes = False
        if v == 4:
            cf = resolve(enc.get("CF", {})) or {}
            stmf = str(resolve(enc.get("StmF", "Identity")))
            cfm = str(resolve((resolve(cf.get(stmf, {})) or {}).get("CFM", "")))
            aes = cfm == "AESV2"
            if cfm == "AESV3" or v == 5:
                raise ValueError("AES-256 (R5/6) unsupported")
        if v not in (1, 2, 4):
            raise ValueError(f"unsupported /V {v}")
        o = bytes(resolve(enc["O"]))
        u = bytes(resolve(enc["U"]))
        p = int(resolve(enc.get("P", -1)))
        em = bool(resolve(enc.get("EncryptMetadata", True)))
        key = compute_key(password, o, p, id0, r, klen, em)
        expect = compute_u(key, id0, r)
        cmp_len = 32 if r == 2 else 16
        if expect[:cmp_len] != u[:cmp_len]:
            raise ValueError("password does not authenticate (user)")
        return cls(key, aes, v, r, o, u, p)

    # -- both ---------------------------------------------------------------
    def _iv(self, num: int, gen: int) -> bytes:
        # The spec wants a random IV. A fixed per-(num,gen) IV is NOT
        # equivalent security-wise: reusing an IV under the same key leaks
        # equal-plaintext-prefix information across rewrites. We knowingly
        # trade CBC IV uniqueness for byte-determinism so the oracle writer
        # emits identical files per run; do not reuse for adversarial input.
        return hashlib.md5(b"iv%d:%d" % (num, gen)).digest()

    def encrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes128_cbc_encrypt(k, self._iv(num, gen), data)
        return rc4(k, data)

    def decrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes128_cbc_decrypt(k, data)
        return rc4(k, data)
