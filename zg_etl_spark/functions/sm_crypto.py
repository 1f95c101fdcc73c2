"""Pure-Python SM3 hash and SM2 public-key encryption — the type-2
key-unwrap primitives (MsgResolver.java:109-125: hutool ``SmUtil.sm2``
over BouncyCastle).

Implemented from the PUBLIC Chinese national standards: GB/T 32905-2016
(SM3 hash), GB/T 32918.3/.4-2016 (SM2 KDF + public-key encryption) with
the recommended curve sm2p256v1 (GB/T 32918.5). Wire behavior matches
the reference's hutool defaults: **C1C3C2** ciphertext order, hex
("Bcd") transport, uncompressed C1 with a tolerated missing ``04``
prefix (MsgResolver.java:112-114).

No SM2 library is installable in this container, so this file is what
turns the former SM2 *fixture* into a real decrypt. It is
correctness-critical but never hot-path: the unwrap runs once per
DISTINCT wire key (cached in decode.sm2_key_unwrapper), never per row.

Self-verification: the SM3 compression function is pinned to the
standard's "abc" known-answer vector, and the curve constants are
machine-checked (G satisfies the curve equation; n·G is the point at
infinity) in tests/test_decode_sinks.py — a transcription error in any
hex constant fails those tests, not silently.
"""

from __future__ import annotations

import secrets

_M32 = 0xFFFFFFFF

_IV = (
    0x7380166F, 0x4914B2B9, 0x172442D7, 0xDA8A0600,
    0xA96F30BC, 0x163138AA, 0xE38DEE4D, 0xB0FB0E4E,
)


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


def _p0(x: int) -> int:
    return x ^ _rotl(x, 9) ^ _rotl(x, 17)


def _p1(x: int) -> int:
    return x ^ _rotl(x, 15) ^ _rotl(x, 23)


def sm3(data: bytes) -> bytes:
    """GB/T 32905-2016 SM3 digest (32 bytes)."""
    bitlen = len(data) * 8
    data = data + b"\x80"
    data += b"\x00" * ((56 - len(data)) % 64)
    data += bitlen.to_bytes(8, "big")
    v = list(_IV)
    for off in range(0, len(data), 64):
        w = [
            int.from_bytes(data[off + 4 * j : off + 4 * j + 4], "big")
            for j in range(16)
        ]
        for j in range(16, 68):
            w.append(
                _p1(w[j - 16] ^ w[j - 9] ^ _rotl(w[j - 3], 15))
                ^ _rotl(w[j - 13], 7)
                ^ w[j - 6]
            )
        a, b, c, d, e, f, g, h = v
        for j in range(64):
            t = 0x79CC4519 if j < 16 else 0x7A879D8A
            ss1 = _rotl((_rotl(a, 12) + e + _rotl(t, j % 32)) & _M32, 7)
            ss2 = ss1 ^ _rotl(a, 12)
            if j < 16:
                ff = a ^ b ^ c
                gg = e ^ f ^ g
            else:
                ff = (a & b) | (a & c) | (b & c)
                gg = (e & f) | ((e ^ _M32) & g)
            tt1 = (ff + d + ss2 + (w[j] ^ w[j + 4])) & _M32
            tt2 = (gg + h + ss1 + w[j]) & _M32
            d, c, b, a = c, _rotl(b, 9), a, tt1
            h, g, f, e = g, _rotl(f, 19), e, _p0(tt2)
        v = [x ^ y for x, y in zip(v, (a, b, c, d, e, f, g, h))]
    return b"".join(x.to_bytes(4, "big") for x in v)


# --- sm2p256v1 (GB/T 32918.5 recommended curve) ----------------------------
P = 0xFFFFFFFEFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF00000000FFFFFFFFFFFFFFFF
A = P - 3
B = 0x28E9FA9E9D9F5E344D5A9E4BCF6509A7F39789F515AB8F92DDBCBD414D940E93
N = 0xFFFFFFFEFFFFFFFFFFFFFFFFFFFFFFFF7203DF6B21C6052B53BBF40939D54123
GX = 0x32C4AE2C1F1981195F9904466A39C9948FE30BBFF2660BE1715A4589334C74C7
GY = 0xBC3736A2F4F6779C59BDCEE36B692153D0A9877CC62A474002DF32E52139F0A0
G = (GX, GY)

Point = tuple[int, int] | None  # None = point at infinity


def on_curve(pt: Point) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + A * x + B)) % P == 0


def ec_add(p1: Point, p2: Point) -> Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1 + A) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return x3, (lam * (x1 - x3) - y1) % P


def ec_mul(k: int, pt: Point) -> Point:
    acc: Point = None
    add = pt
    while k:
        if k & 1:
            acc = ec_add(acc, add)
        add = ec_add(add, add)
        k >>= 1
    return acc


def _kdf(z: bytes, klen: int) -> bytes:
    """GB/T 32918.3 §5.4.3 key derivation: counter-mode SM3."""
    out = b""
    ct = 1
    while len(out) < klen:
        out += sm3(z + ct.to_bytes(4, "big"))
        ct += 1
    return out[:klen]


def sm2_keypair() -> tuple[int, tuple[int, int]]:
    """Mint (d, P=d·G). Test fixtures only — production keys are
    deployment secrets, exactly as the reference's Config.SM2_PRIKEY."""
    d = secrets.randbelow(N - 2) + 1
    return d, ec_mul(d, G)


def sm2_encrypt_hex(pub: tuple[int, int], msg: bytes) -> str:
    """GB/T 32918.4 §6.1 encryption, hutool/BC default C1C3C2 order,
    hex transport with the uncompressed ``04`` prefix. Randomized (fresh
    k per call) — used only to build test wires; the engine lane is the
    decrypt below."""
    if not msg:
        raise ValueError("empty plaintext")
    while True:
        k = secrets.randbelow(N - 2) + 1
        x1, y1 = ec_mul(k, G)
        x2, y2 = ec_mul(k, pub)
        z = x2.to_bytes(32, "big") + y2.to_bytes(32, "big")
        t = _kdf(z, len(msg))
        if any(t):
            break
    c2 = bytes(m ^ s for m, s in zip(msg, t))
    c3 = sm3(x2.to_bytes(32, "big") + msg + y2.to_bytes(32, "big"))
    return (
        "04"
        + x1.to_bytes(32, "big").hex()
        + y1.to_bytes(32, "big").hex()
        + c3.hex()
        + c2.hex()
    )


def sm2_decrypt_hex(d: int, ct_hex: str) -> bytes:
    """GB/T 32918.4 §7.1 decryption of a C1C3C2 hex ciphertext.
    Raises ValueError on every malformation class the standard rejects:
    bad hex, short ciphertext, C1 not on the curve, an all-zero KDF
    stream, or a C3 MAC mismatch (tamper)."""
    try:
        raw = bytes.fromhex(ct_hex)
    except ValueError as exc:
        raise ValueError("SM2 ciphertext is not hex") from exc
    if len(raw) < 1 + 64 + 32 + 1 or raw[0] != 0x04:
        raise ValueError("SM2 ciphertext malformed")
    c1 = (int.from_bytes(raw[1:33], "big"), int.from_bytes(raw[33:65], "big"))
    if not on_curve(c1) or c1 == (0, 0):
        raise ValueError("C1 is not a curve point")
    c3, c2 = raw[65:97], raw[97:]
    x2, y2 = ec_mul(d, c1)
    z = x2.to_bytes(32, "big") + y2.to_bytes(32, "big")
    t = _kdf(z, len(c2))
    if not any(t):
        raise ValueError("KDF produced an all-zero stream")
    msg = bytes(c ^ s for c, s in zip(c2, t))
    if sm3(x2.to_bytes(32, "big") + msg + y2.to_bytes(32, "big")) != c3:
        raise ValueError("C3 MAC mismatch (tampered ciphertext)")
    return msg
