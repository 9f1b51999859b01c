"""PDF standard security handler (ISO 32000 §7.6) — pure Python.

The dominant "encrypted" case in document crawls is a PDF encrypted
with an EMPTY user password (viewers open it without prompting; only
permissions are owner-gated).  This module implements enough of the
standard security handler to authenticate that case and decrypt the
content: RC4 (V1/V2, R2-R4), AES-128-CBC (V4 /AESV2, R4), and
AES-256-CBC (V5 /AESV3, R5/R6 including the R6 hardened hash,
ISO 32000-2 Algorithm 2.B).  Non-empty passwords stay a named
boundary — authentication failure reports, it does not guess.

Everything here is the published standard: the 32-byte padding
constant, MD5/SHA iteration counts, and per-object key salts come
from ISO 32000-1 §7.6.3 / 32000-2 §7.6.4; AES is FIPS-197 implemented
from the spec (S-box generated from the GF(2^8) construction, not
pasted); RC4 is the classic public stream cipher.  hashlib provides
the digests.

Fixture-side twins (``make_encrypt_material``) compute real /O /U
(/OE /UE /Perms for V5) values for empty user+owner passwords so the
catalog oracles exercise authentication and decryption end-to-end.

Scale: decryption is a per-blob kernel inside the pdfscan mapInPandas
walkers — zero shuffle; pure-Python AES costs ~30us/block, the honest
vendored-crypto cost (the triage gate reads no stream bytes at all).
"""

from __future__ import annotations

import hashlib

__all__ = [
    "rc4",
    "aes_cbc_encrypt",
    "aes_cbc_decrypt",
    "authenticate_empty_user_password",
    "object_key",
    "decrypt_data",
    "encrypt_data",
    "make_encrypt_material",
    "PAD",
]

# ISO 32000-1 §7.6.3.3: the standard 32-byte password padding string
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


# --- RC4 ----------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --- AES (FIPS-197) -----------------------------------------------------------

def _build_sbox() -> "tuple[list[int], list[int]]":
    # multiplicative inverse in GF(2^8) via 3 as generator, then the
    # affine transform — the FIPS-197 construction
    sbox = [0] * 256
    inv = [0] * 256
    p = q = 1
    while True:
        # p = p * 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q = q / 3 (multiply by the inverse of 3, iterated)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_SBOX, _INV_SBOX = _build_sbox()


def _xt(a: int) -> int:
    return ((a << 1) ^ (0x1B if a & 0x80 else 0)) & 0xFF


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xt(a)
        b >>= 1
    return out


# precomputed multiply tables for the (inv)MixColumns constants
_M2 = [_gmul(i, 2) for i in range(256)]
_M3 = [_gmul(i, 3) for i in range(256)]
_M9 = [_gmul(i, 9) for i in range(256)]
_M11 = [_gmul(i, 11) for i in range(256)]
_M13 = [_gmul(i, 13) for i in range(256)]
_M14 = [_gmul(i, 14) for i in range(256)]


def _expand_key(key: bytes) -> "list[list[int]]":
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            rcon = _xt(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    # group into round keys of 16 bytes
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _encrypt_block(rk: "list[list[int]]", block: bytes) -> bytes:
    s = [block[i] ^ rk[0][i] for i in range(16)]
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        t = [
            _SBOX[s[0]], _SBOX[s[5]], _SBOX[s[10]], _SBOX[s[15]],
            _SBOX[s[4]], _SBOX[s[9]], _SBOX[s[14]], _SBOX[s[3]],
            _SBOX[s[8]], _SBOX[s[13]], _SBOX[s[2]], _SBOX[s[7]],
            _SBOX[s[12]], _SBOX[s[1]], _SBOX[s[6]], _SBOX[s[11]],
        ]
        k = rk[rnd]
        s = []
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s += [
                _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ k[4 * c],
                a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ k[4 * c + 1],
                a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ k[4 * c + 2],
                _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ k[4 * c + 3],
            ]
    t = [
        _SBOX[s[0]], _SBOX[s[5]], _SBOX[s[10]], _SBOX[s[15]],
        _SBOX[s[4]], _SBOX[s[9]], _SBOX[s[14]], _SBOX[s[3]],
        _SBOX[s[8]], _SBOX[s[13]], _SBOX[s[2]], _SBOX[s[7]],
        _SBOX[s[12]], _SBOX[s[1]], _SBOX[s[6]], _SBOX[s[11]],
    ]
    k = rk[-1]
    return bytes(t[i] ^ k[i] for i in range(16))


def _decrypt_block(rk: "list[list[int]]", block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [block[i] ^ rk[nr][i] for i in range(16)]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = [
            _INV_SBOX[s[0]], _INV_SBOX[s[13]], _INV_SBOX[s[10]], _INV_SBOX[s[7]],
            _INV_SBOX[s[4]], _INV_SBOX[s[1]], _INV_SBOX[s[14]], _INV_SBOX[s[11]],
            _INV_SBOX[s[8]], _INV_SBOX[s[5]], _INV_SBOX[s[2]], _INV_SBOX[s[15]],
            _INV_SBOX[s[12]], _INV_SBOX[s[9]], _INV_SBOX[s[6]], _INV_SBOX[s[3]],
        ]
        k = rk[rnd]
        t = [t[i] ^ k[i] for i in range(16)]
        s = []
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s += [
                _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
            ]
    t = [
        _INV_SBOX[s[0]], _INV_SBOX[s[13]], _INV_SBOX[s[10]], _INV_SBOX[s[7]],
        _INV_SBOX[s[4]], _INV_SBOX[s[1]], _INV_SBOX[s[14]], _INV_SBOX[s[11]],
        _INV_SBOX[s[8]], _INV_SBOX[s[5]], _INV_SBOX[s[2]], _INV_SBOX[s[15]],
        _INV_SBOX[s[12]], _INV_SBOX[s[9]], _INV_SBOX[s[6]], _INV_SBOX[s[3]],
    ]
    k = rk[0]
    return bytes(t[i] ^ k[i] for i in range(16))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, *, pad: bool = True) -> bytes:
    """AES-CBC encrypt.  ``pad=True`` applies PKCS#7 (the PDF stream
    convention); ``pad=False`` requires block-aligned input (the R6
    hash and UE/OE wrapping use no padding)."""
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded AES-CBC needs block-aligned input")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rk, block)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, *, unpad: bool = True) -> bytes:
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC ciphertext must be non-empty blocks")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
        prev = block
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16 or len(out) < n:
            raise ValueError("pdf: bad AES padding (wrong key or corrupt data)")
        del out[len(out) - n:]
    return bytes(out)


# --- standard security handler key derivation ---------------------------------

def _alg2_file_key(
    password: bytes, o: bytes, p: int, id0: bytes, r: int, key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2 (ISO 32000-1 §7.6.3.3): the RC4/AESV2 file key."""
    h = hashlib.md5()
    h.update((password + PAD)[:32])
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()[:key_len]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()[:key_len]
    return key


def _alg3_o_value(user_pw: bytes, owner_pw: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3: the /O value."""
    h = hashlib.md5((owner_pw + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4_key = h[:key_len]
    o = rc4(rc4_key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def _alg45_u_value(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3-4): the /U value (32 bytes)."""
    if r == 2:
        return rc4(file_key, PAD)
    u = rc4(file_key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + bytes(16)  # 16 arbitrary padding bytes


import functools


@functools.lru_cache(maxsize=256)
def _alg2b_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (ISO 32000-2 §7.6.4.3.4): the R6 hardened hash —
    SHA-256 seeded, then a >=64-round loop of AES-128-CBC over the
    repeated input selecting SHA-256/384/512 by the ciphertext mod 3,
    terminating when the last byte of E <= round - 32.  The hash is
    deliberately expensive (~0.2s in pure Python); the LRU makes
    re-authenticating the SAME document (identical salts) per Arrow
    batch a one-time cost per worker process."""
    k = hashlib.sha256(password + salt + udata).digest()
    e = b"\xff"  # not consulted before round 64
    i = 0
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
    return k[:32]


def _r5_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """The deprecated R5 (Adobe ExtensionLevel 3) plain SHA-256."""
    return hashlib.sha256(password + salt + udata).digest()


def authenticate_empty_user_password(enc: dict, id0: bytes):
    """Try the EMPTY user password against a parsed /Encrypt dict
    (keys: v, r, o, u, oe, ue, p, length, encrypt_metadata).  Returns
    the file encryption key on success, None when the document really
    requires a password.  Raises ValueError for malformed material and
    NotImplementedError for unsupported revisions."""
    r = enc["r"]
    if r in (2, 3, 4):
        o, u = enc["o"], enc["u"]
        if len(o) < 32 or len(u) < 16:
            raise ValueError("pdf: /O//U strings too short")
        key_len = max(5, min(16, enc.get("length", 40) // 8))
        if r == 2:
            key_len = 5
        key = _alg2_file_key(
            b"", o, enc["p"], id0, r, key_len, enc.get("encrypt_metadata", True)
        )
        want = _alg45_u_value(key, id0, r)
        got = u[:32] if r == 2 else u[:16]
        ref = want[:32] if r == 2 else want[:16]
        return key if got == ref else None
    if r in (5, 6):
        u, ue = enc["u"], enc.get("ue")
        if len(u) < 48 or not ue or len(ue) < 32:
            raise ValueError("pdf: V5 /U//UE material too short")
        vsalt, ksalt = u[32:40], u[40:48]
        hash_fn = _alg2b_hash if r == 6 else _r5_hash
        if hash_fn(b"", vsalt) != u[:32]:
            return None
        ikey = hash_fn(b"", ksalt)
        return aes_cbc_decrypt(ikey, bytes(16), ue[:32], unpad=False)
    raise NotImplementedError(f"pdf: standard security handler revision {r}")


def object_key(file_key: bytes, num: int, gen: int, *, aes: bool, v: int) -> bytes:
    """Per-object key (Algorithm 1; V5 uses the file key directly)."""
    if v >= 5:
        return file_key
    h = hashlib.md5()
    h.update(file_key)
    h.update(num.to_bytes(3, "little"))
    h.update(gen.to_bytes(2, "little"))
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_data(data: bytes, key: bytes, *, aes: bool) -> bytes:
    if not aes:
        return rc4(key, data)
    if len(data) < 32:
        raise ValueError("pdf: AES stream shorter than IV + one block")
    return aes_cbc_decrypt(key, data[:16], data[16:])


def encrypt_data(data: bytes, key: bytes, iv: bytes, *, aes: bool) -> bytes:
    if not aes:
        return rc4(key, data)
    return iv + aes_cbc_encrypt(key, iv, data)


# --- fixture-side material -----------------------------------------------------

def make_encrypt_material(mode: str, seed: int = 0) -> dict:
    """Real /Encrypt material for EMPTY user+owner passwords:
    mode 'rc4' (V2 R3 128-bit), 'aesv2' (V4 R4 AES-128), 'aesv3'
    (V5 R6 AES-256).  Deterministic per seed.  Returns dict with
    ``dict_body`` (the /Encrypt object body), ``id0``, ``file_key``,
    ``v``, ``aes``."""
    p = -3904  # typical permission bits, print+copy denied pattern
    id0 = hashlib.md5(f"spark-graft-pdf-{seed}".encode()).digest()
    if mode in ("rc4", "aesv2"):
        r = 3 if mode == "rc4" else 4
        v = 2 if mode == "rc4" else 4
        key_len = 16
        o = _alg3_o_value(b"", b"", r, key_len)
        key = _alg2_file_key(b"", o, p, id0, r, key_len)
        u = _alg45_u_value(key, id0, r)
        cf = ""
        if mode == "aesv2":
            cf = (
                " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                "/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        body = (
            f"<< /Filter /Standard /V {v} /R {r} /Length 128 /P {p}"
            f" /O <{o.hex().upper()}> /U <{u.hex().upper()}>{cf} >>"
        ).encode()
        return {"dict_body": body, "id0": id0, "file_key": key,
                "v": v, "aes": mode == "aesv2"}
    if mode == "aesv3":
        rnd = hashlib.sha256(f"salts-{seed}".encode()).digest()
        vsalt, ksalt = rnd[:8], rnd[8:16]
        ovsalt, oksalt = rnd[16:24], rnd[24:32]
        file_key = hashlib.sha256(f"filekey-{seed}".encode()).digest()
        u = _alg2b_hash(b"", vsalt) + vsalt + ksalt
        ue = aes_cbc_encrypt(_alg2b_hash(b"", ksalt), bytes(16), file_key, pad=False)
        o = _alg2b_hash(b"", ovsalt, u) + ovsalt + oksalt
        oe = aes_cbc_encrypt(
            _alg2b_hash(b"", oksalt, u), bytes(16), file_key, pad=False
        )
        perms_plain = (
            (p & 0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff"
            + b"Tadb" + bytes(4)
        )
        perms = aes_cbc_encrypt(file_key, bytes(16), perms_plain, pad=False)
        # ECB for /Perms per spec: CBC with zero IV equals ECB for one block
        body = (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {p}"
            f" /O <{o.hex().upper()}> /U <{u.hex().upper()}>"
            f" /OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}>"
            f" /Perms <{perms.hex().upper()}>"
            " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
            " /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
        ).encode()
        return {"dict_body": body, "id0": id0, "file_key": file_key,
                "v": 5, "aes": True}
    raise ValueError(f"unknown encryption fixture mode {mode!r}")
