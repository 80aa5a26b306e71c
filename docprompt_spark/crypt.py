"""Encrypted-PDF support: the Standard security handler (PDF 32000-1 §7.6).

The reference opens encrypted PDFs through pdfium (``PdfDocument.password``,
reference schema/document.py:64); a 100 TB crawl corpus always contains
them. From scratch here:

* RC4 (the §7.6.2 stream cipher, 40- and 128-bit keys),
* AES-128 AND AES-256 (FIPS-197, T-table form; the S-box and T-tables are
  *generated* from GF(2^8) inversion + the affine map rather than
  transcribed, so a typo is impossible), CBC mode with the §7.6.2 layout
  (16-byte IV prefix, PKCS#7 padding) plus the raw no-pad CBC/ECB forms
  the R6 algorithms need,
* the Standard handler's key algorithms (§7.6.3.3 Algorithms 1-5):
  /V1 /R2 RC4-40, /V2 /R3 RC4-128, /V4 /R4 AES-128 (/AESV2 crypt filter),
* PDF 2.0 /V5 /R6 AES-256 (/AESV3 — ISO 32000-2 Algorithms 2.A/2.B/8-10:
  the iterated SHA-256/384/512 KDF, /U //O validation+key salts, file-key
  wrapping via /UE //OE, and the /Perms integrity block).

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


# T-tables (generated, not transcribed): Te[x] packs SubBytes+MixColumns for
# one input byte; Td likewise for the equivalent inverse cipher (FIPS-197
# §5.3.5). ~10x over the naive matrix form — R6's Algorithm 2.B KDF runs
# thousands of block encryptions per password hash.


def _ror32(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


_TE0 = [
    (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
    for s in _SBOX
]
_TE1 = [_ror32(t, 8) for t in _TE0]
_TE2 = [_ror32(t, 16) for t in _TE0]
_TE3 = [_ror32(t, 24) for t in _TE0]
_TD0 = [
    (_gmul(s, 14) << 24) | (_gmul(s, 9) << 16) | (_gmul(s, 13) << 8)
    | _gmul(s, 11)
    for s in _INV_SBOX
]
_TD1 = [_ror32(t, 8) for t in _TD0]
_TD2 = [_ror32(t, 16) for t in _TD0]
_TD3 = [_ror32(t, 24) for t in _TD0]


def _imc_word(w: int) -> int:
    """InvMixColumns on one packed column word (decrypt key schedule)."""
    a = [(w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF]
    return (
        ((_gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)) << 24)
        | ((_gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)) << 16)
        | ((_gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)) << 8)
        | (_gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14))
    )


def _expand_key(key: bytes):
    """FIPS-197 key schedule for Nk=4 (AES-128) or Nk=8 (AES-256); returns
    packed big-endian column words."""
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = _ror32(t, 24)  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk > 6 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


def _encrypt_block(block: bytes, w) -> bytes:
    _TE0_, _TE1_, _TE2_, _TE3_ = _TE0, _TE1, _TE2, _TE3  # locals: hot loop
    nr = len(w) // 4 - 1
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = _TE0_[(s0 >> 24) & 255] ^ _TE1_[(s1 >> 16) & 255] ^ _TE2_[(s2 >> 8) & 255] ^ _TE3_[s3 & 255] ^ w[k]
        t1 = _TE0_[(s1 >> 24) & 255] ^ _TE1_[(s2 >> 16) & 255] ^ _TE2_[(s3 >> 8) & 255] ^ _TE3_[s0 & 255] ^ w[k + 1]
        t2 = _TE0_[(s2 >> 24) & 255] ^ _TE1_[(s3 >> 16) & 255] ^ _TE2_[(s0 >> 8) & 255] ^ _TE3_[s1 & 255] ^ w[k + 2]
        t3 = _TE0_[(s3 >> 24) & 255] ^ _TE1_[(s0 >> 16) & 255] ^ _TE2_[(s1 >> 8) & 255] ^ _TE3_[s2 & 255] ^ w[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    o0 = ((_SBOX[(s0 >> 24) & 255] << 24) | (_SBOX[(s1 >> 16) & 255] << 16)
          | (_SBOX[(s2 >> 8) & 255] << 8) | _SBOX[s3 & 255]) ^ w[k]
    o1 = ((_SBOX[(s1 >> 24) & 255] << 24) | (_SBOX[(s2 >> 16) & 255] << 16)
          | (_SBOX[(s3 >> 8) & 255] << 8) | _SBOX[s0 & 255]) ^ w[k + 1]
    o2 = ((_SBOX[(s2 >> 24) & 255] << 24) | (_SBOX[(s3 >> 16) & 255] << 16)
          | (_SBOX[(s0 >> 8) & 255] << 8) | _SBOX[s1 & 255]) ^ w[k + 2]
    o3 = ((_SBOX[(s3 >> 24) & 255] << 24) | (_SBOX[(s0 >> 16) & 255] << 16)
          | (_SBOX[(s1 >> 8) & 255] << 8) | _SBOX[s2 & 255]) ^ w[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _inv_key(w) -> tuple:
    """Decrypt round keys for the equivalent inverse cipher: reversed, with
    InvMixColumns applied to the middle rounds."""
    nr = len(w) // 4 - 1
    dk = list(w)
    for rnd in range(1, nr):
        for c in range(4):
            dk[4 * rnd + c] = _imc_word(w[4 * rnd + c])
    return tuple(dk)


def _decrypt_block(block: bytes, w) -> bytes:
    nr = len(w) // 4 - 1
    dk = _inv_key(w) if not isinstance(w, tuple) else w
    s0 = int.from_bytes(block[0:4], "big") ^ dk[4 * nr]
    s1 = int.from_bytes(block[4:8], "big") ^ dk[4 * nr + 1]
    s2 = int.from_bytes(block[8:12], "big") ^ dk[4 * nr + 2]
    s3 = int.from_bytes(block[12:16], "big") ^ dk[4 * nr + 3]
    for rnd in range(nr - 1, 0, -1):
        k = 4 * rnd
        t0 = _TD0[(s0 >> 24) & 255] ^ _TD1[(s3 >> 16) & 255] ^ _TD2[(s2 >> 8) & 255] ^ _TD3[s1 & 255] ^ dk[k]
        t1 = _TD0[(s1 >> 24) & 255] ^ _TD1[(s0 >> 16) & 255] ^ _TD2[(s3 >> 8) & 255] ^ _TD3[s2 & 255] ^ dk[k + 1]
        t2 = _TD0[(s2 >> 24) & 255] ^ _TD1[(s1 >> 16) & 255] ^ _TD2[(s0 >> 8) & 255] ^ _TD3[s3 & 255] ^ dk[k + 2]
        t3 = _TD0[(s3 >> 24) & 255] ^ _TD1[(s2 >> 16) & 255] ^ _TD2[(s1 >> 8) & 255] ^ _TD3[s0 & 255] ^ dk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    I = _INV_SBOX
    o0 = ((I[(s0 >> 24) & 255] << 24) | (I[(s3 >> 16) & 255] << 16)
          | (I[(s2 >> 8) & 255] << 8) | I[s1 & 255]) ^ dk[0]
    o1 = ((I[(s1 >> 24) & 255] << 24) | (I[(s0 >> 16) & 255] << 16)
          | (I[(s3 >> 8) & 255] << 8) | I[s2 & 255]) ^ dk[1]
    o2 = ((I[(s2 >> 24) & 255] << 24) | (I[(s1 >> 16) & 255] << 16)
          | (I[(s0 >> 8) & 255] << 8) | I[s3 & 255]) ^ dk[2]
    o3 = ((I[(s3 >> 24) & 255] << 24) | (I[(s2 >> 16) & 255] << 16)
          | (I[(s1 >> 8) & 255] << 8) | I[s0 & 255]) ^ dk[3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with PKCS#7 padding; returns iv + ciphertext (PDF §7.6.2
    AESV2/AESV3 layout). Key length selects AES-128 or AES-256."""
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


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES payload")
    w = _inv_key(_expand_key(key))  # once per payload, not per block
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


# kept for callers/tests written against the AES-128-only names
aes128_cbc_encrypt = aes_cbc_encrypt
aes128_cbc_decrypt = aes_cbc_decrypt


def aes_cbc_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """Raw CBC, no padding, no IV prefix (R6 key wrapping + Algorithm 2.B
    hash rounds; ``data`` must be block-aligned)."""
    if len(data) % 16:
        raise ValueError("unaligned CBC payload")
    w = _expand_key(key)
    if not encrypt:
        w = _inv_key(w)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        if encrypt:
            prev = _encrypt_block(bytes(a ^ b for a, b in zip(blk, prev)), w)
            out += prev
        else:
            out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, w), prev))
            prev = blk
    return bytes(out)


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB (the R6 /Perms entry)."""
    return _encrypt_block(block, _expand_key(key))


def hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated SHA-256/384/512 KDF.
    ``udata`` is the 48-byte /U value when deriving owner-side hashes,
    else b""."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = aes_cbc_nopad(k[:16], k[16:32], k1, encrypt=True)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
    return k[:32]


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
    "aes-256": (5, 6, 32, True),  # PDF 2.0 /AESV3, Algorithms 2.A/2.B/8-10
}


class StdSecurityHandler:
    """Both sides of the Standard handler: the writer creates one with
    :meth:`create`; the reader with :meth:`from_encrypt_dict` (empty user
    password — the overwhelmingly common "owner-locked" crawl case)."""

    def __init__(self, key: bytes, aes: bool, v: int, r: int,
                 o: bytes, u: bytes, p: int,
                 oe: bytes = b"", ue: bytes = b"", perms: bytes = b"") -> None:
        self.key, self.aes, self.v, self.r = key, aes, v, r
        self.o, self.u, self.p = o, u, p
        self.oe, self.ue, self.perms = oe, ue, perms

    # -- writer side --------------------------------------------------------
    @classmethod
    def create(cls, mode: str, id0: bytes, user_pwd: bytes = b"",
               owner_pwd: bytes = b"owner", p: int = -3904) -> "StdSecurityHandler":
        v, r, klen, aes = _MODES[mode]
        if r == 6:
            return cls._create_r6(id0, user_pwd, owner_pwd, p)
        o = compute_o(owner_pwd, user_pwd, r, klen)
        key = compute_key(user_pwd, o, p, id0, r, klen)
        u = compute_u(key, id0, r)
        return cls(key, aes, v, r, o, u, p)

    @classmethod
    def _create_r6(cls, id0: bytes, user_pwd: bytes, owner_pwd: bytes,
                   p: int) -> "StdSecurityHandler":
        """ISO 32000-2 Algorithms 8-10. The spec wants random file key and
        salts; they derive from id0 here so the oracle writer stays
        byte-deterministic (same tradeoff as the CBC IVs, documented
        at :meth:`_iv`)."""
        key = hashlib.sha256(b"r6filekey:" + id0).digest()  # 32-byte file key
        uvs = hashlib.md5(b"uvs:" + id0).digest()[:8]
        uks = hashlib.md5(b"uks:" + id0).digest()[:8]
        u = hash_2b(user_pwd, uvs, b"") + uvs + uks  # 48 bytes
        ue = aes_cbc_nopad(hash_2b(user_pwd, uks, b""), b"\x00" * 16, key, True)
        ovs = hashlib.md5(b"ovs:" + id0).digest()[:8]
        oks = hashlib.md5(b"oks:" + id0).digest()[:8]
        o = hash_2b(owner_pwd, ovs, u) + ovs + oks
        oe = aes_cbc_nopad(hash_2b(owner_pwd, oks, u), b"\x00" * 16, key, True)
        # Algorithm 10: P as 64-bit LE with the high 32 bits set, then
        # 'T' (EncryptMetadata) + 'adb' + 4 deterministic filler bytes
        pblock = (
            struct.pack("<Q", (p & 0xFFFFFFFF) | 0xFFFFFFFF00000000)
            + b"T" + b"adb" + b"\x00" * 4
        )
        perms = aes_ecb_encrypt_block(key, pblock)
        return cls(key, True, 5, 6, o, u, p, oe=oe, ue=ue, perms=perms)

    def encrypt_dict_body(self) -> str:
        from docprompt_spark.pdfwrite import esc_literal

        def s(b: bytes) -> str:
            return esc_literal(b).decode("latin-1")

        body = (
            f"<< /Filter /Standard /V {self.v} /R {self.r}"
            f" /Length {len(self.key) * 8} /P {self.p}"
        )
        if self.v == 4:
            body += (
                " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                " /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        elif self.v == 5:
            body += (
                " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                " /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
            )
        body += f" /O ({s(self.o)}) /U ({s(self.u)})"
        if self.v == 5:
            body += (
                f" /OE ({s(self.oe)}) /UE ({s(self.ue)})"
                f" /Perms ({s(self.perms)})"
            )
        body += " >>"
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
        if v == 5:
            if r == 5:
                raise ValueError(
                    "R5 (the withdrawn Adobe interim scheme) unsupported"
                )
            return cls._from_r6(enc, resolve, password)
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

    @classmethod
    def _from_r6(cls, enc: dict, resolve, password: bytes) -> "StdSecurityHandler":
        """ISO 32000-2 Algorithm 2.A: authenticate as user (then owner) and
        unwrap the 32-byte file key from /UE (or /OE). /ID plays no role in
        R6 key derivation."""
        o = bytes(resolve(enc["O"]))[:48]
        u = bytes(resolve(enc["U"]))[:48]
        ue = bytes(resolve(enc.get("UE", b"")))
        oe = bytes(resolve(enc.get("OE", b"")))
        p = int(resolve(enc.get("P", -1)))
        perms = bytes(resolve(enc.get("Perms", b"")))
        # UTF-8, SASLprep'd in principle; ASCII passwords are unaffected
        pwd = password[:127]
        if hash_2b(pwd, u[32:40], b"") == u[:32]:  # user password
            ikey = hash_2b(pwd, u[40:48], b"")
            key = aes_cbc_nopad(ikey, b"\x00" * 16, ue[:32], encrypt=False)
        elif hash_2b(pwd, o[32:40], u) == o[:32]:  # owner password
            ikey = hash_2b(pwd, o[40:48], u)
            key = aes_cbc_nopad(ikey, b"\x00" * 16, oe[:32], encrypt=False)
        else:
            raise ValueError("password does not authenticate (R6)")
        if len(perms) >= 16:
            dec = aes_cbc_nopad(key, b"\x00" * 16, perms[:16], encrypt=False)
            # ECB == CBC with zero IV for a single block
            if dec[9:12] != b"adb":
                raise ValueError("R6 /Perms integrity check failed")
        return cls(key, True, 5, 6, o, u, p, oe=oe, ue=ue, perms=perms)

    # -- both ---------------------------------------------------------------
    def _iv(self, num: int, gen: int) -> bytes:
        # The spec wants a random IV. A fixed per-(num,gen) IV is NOT
        # equivalent security-wise: reusing an IV under the same key leaks
        # equal-plaintext-prefix information across rewrites. We knowingly
        # trade CBC IV uniqueness for byte-determinism so the oracle writer
        # emits identical files per run; do not reuse for adversarial input.
        return hashlib.md5(b"iv%d:%d" % (num, gen)).digest()

    def encrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        if self.v == 5:
            # Algorithm 1.A: the FILE key encrypts directly — no per-object
            # key derivation in AESV3
            return aes_cbc_encrypt(self.key, self._iv(num, gen), data)
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes_cbc_encrypt(k, self._iv(num, gen), data)
        return rc4(k, data)

    def decrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        if self.v == 5:
            return aes_cbc_decrypt(self.key, data)
        k = object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes_cbc_decrypt(k, data)
        return rc4(k, data)
