"""Batched Ed25519 verification on TPU: one lane per signature.

TPU-native equivalent of the reference's EdDSA STARK gadget
(`curta_eddsa_verify_sigs_conditional`,
/root/reference/circuits/builder/verify.rs:248-259) — the validator-lane
axis is the key parallel dimension (SURVEY.md §2c). Verifies the cofactorless
equation  [s]B == R + [k]A  as  Q = [s]B + [k](-A)  and then  Q == R
projectively (no device-side inversion).

Field arithmetic over p = 2^255 - 19 uses 20 limbs x 13 bits in uint32 —
schoolbook products stay < 2^31, so everything runs on the 32-bit VPU.
Point decompression, the challenge k = SHA-512(R‖A‖M) mod L, and the
4-entry Straus table are host-side witness prep (Python ints); the 253-step
double-and-add ladder is the device hot loop.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Curve constants
# ---------------------------------------------------------------------------

P25519 = 2**255 - 19
L_ORDER = 2**252 + 27742317777372353535851937790883648493
D_ED = (-121665 * pow(121666, P25519 - 2, P25519)) % P25519
D2_ED = (2 * D_ED) % P25519
BASE_Y = (4 * pow(5, P25519 - 2, P25519)) % P25519

N_LIMBS = 20
LIMB_BITS = 13
LIMB_MASK = (1 << LIMB_BITS) - 1
N_BITS = 253


def _sqrt_m1() -> int:
    return pow(2, (P25519 - 1) // 4, P25519)


SQRT_M1 = _sqrt_m1()


def recover_x(y: int, sign: int) -> int | None:
    """Ed25519 point decompression (RFC 8032 §5.1.3)."""
    if y >= P25519:
        return None
    x2 = (y * y - 1) * pow(D_ED * y * y + 1, P25519 - 2, P25519) % P25519
    if x2 == 0:
        if sign:
            return None
        return 0
    x = pow(x2, (P25519 + 3) // 8, P25519)
    if (x * x - x2) % P25519 != 0:
        x = x * SQRT_M1 % P25519
    if (x * x - x2) % P25519 != 0:
        return None
    if x & 1 != sign:
        x = P25519 - x
    return x


def decompress(point: bytes) -> tuple[int, int] | None:
    y = int.from_bytes(point, "little") & ((1 << 255) - 1)
    sign = point[31] >> 7
    x = recover_x(y, sign)
    if x is None:
        return None
    return (x, y)


def compute_base_point() -> tuple[int, int]:
    x = recover_x(BASE_Y, 0)
    return (x, BASE_Y)


BASE_POINT = compute_base_point()


# -- host (python int) Edwards arithmetic: witness prep + oracle ------------


def pt_add(p, q):
    (x1, y1), (x2, y2) = p, q
    x3 = (x1 * y2 + x2 * y1) * pow(1 + D_ED * x1 * x2 * y1 * y2, P25519 - 2, P25519)
    y3 = (y1 * y2 + x1 * x2) * pow(1 - D_ED * x1 * x2 * y1 * y2, P25519 - 2, P25519)
    return (x3 % P25519, y3 % P25519)


def pt_neg(p):
    x, y = p
    return ((-x) % P25519, y)


def pt_mul(k: int, p):
    q = (0, 1)
    while k:
        if k & 1:
            q = pt_add(q, p)
        p = pt_add(p, p)
        k >>= 1
    return q


def verify_ints(pubkey: bytes, msg: bytes, sig: bytes) -> bool:
    """Host oracle: cofactorless Ed25519 verification in pure Python."""
    A = decompress(pubkey)
    R = decompress(sig[:32])
    if A is None or R is None:
        return False
    s = int.from_bytes(sig[32:], "little")
    if s >= L_ORDER:
        return False
    k = int.from_bytes(hashlib.sha512(sig[:32] + pubkey + msg).digest(), "little") % L_ORDER
    return pt_mul(s, BASE_POINT) == pt_add(R, pt_mul(k, A))


# ---------------------------------------------------------------------------
# Limb packing
# ---------------------------------------------------------------------------


def int_to_limbs(x: int) -> np.ndarray:
    out = np.zeros(N_LIMBS, dtype=np.uint32)
    for i in range(N_LIMBS):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0
    return out


def limbs_to_int(l) -> int:
    l = np.asarray(l)
    return sum(int(l[i]) << (LIMB_BITS * i) for i in range(len(l)))


# Per-limb padding representing a multiple of p with every limb >= 2^15 so
# limb-wise subtraction cannot underflow (pad + a - b stays in uint32).
def _make_sub_pad():
    # 256p has (256p >> 260) = 7 in the 21st limb, enough to borrow from so
    # every low limb can be raised to >= 2^15.
    target = 256 * P25519
    v = target
    base = [0] * 21
    for i in range(21):
        base[i] = v & LIMB_MASK
        v >>= LIMB_BITS
    assert v == 0
    for i in range(20):
        base[i] += 1 << 15
        base[i + 1] -= 4
    assert all(b >= (1 << 15) for b in base[:20]), base[:20]
    assert base[20] >= 0
    total = sum(b << (LIMB_BITS * i) for i, b in enumerate(base))
    assert total == target
    return np.array(base[:20], dtype=np.uint32), np.array([base[20]], dtype=np.uint32)


_SUB_PAD, _SUB_PAD_TOP = _make_sub_pad()


# ---------------------------------------------------------------------------
# Device field ops (arrays of shape (..., 20) uint32, limbs <= 13 bits)
# ---------------------------------------------------------------------------


def _carry20(x):
    """Carry-propagate a (..., 20) array (values up to ~2^31) into 13-bit
    limbs, folding overflow beyond 2^255 back via 19*2^-255."""

    def step(i, x):
        c = x[..., i] >> LIMB_BITS
        x = x.at[..., i].set(x[..., i] & LIMB_MASK)
        x = x.at[..., i + 1].add(c)
        return x

    x = jax.lax.fori_loop(0, N_LIMBS - 1, step, x)
    # top limb: bits >= 8 represent multiples of 2^255 -> fold * 19
    top = x[..., N_LIMBS - 1]
    h = top >> 8
    x = x.at[..., N_LIMBS - 1].set(top & 0xFF)
    x = x.at[..., 0].add(h * 19)
    # one more cheap carry pass for the low limbs touched by the fold
    x = jax.lax.fori_loop(0, 2, step, x)
    return x


def fadd(a, b):
    return _carry20(a + b)


def fsub(a, b):
    pad = jnp.asarray(_SUB_PAD)
    x = a + pad - b
    # top pad limb folds via 2^260 = 2^255 * 32 -> 19*32 = 608 at limb 0
    x = x.at[..., 0].add(jnp.asarray(_SUB_PAD_TOP)[0] * 608)
    return _carry20(x)


def fmul(a, b):
    """Schoolbook 20x20 product (max partial sum 20*(2^13)^2 < 2^31, so no
    interleaved carries needed), then reduce 40 limbs -> 20."""
    shape = a.shape[:-1]
    acc = jnp.zeros(shape + (2 * N_LIMBS,), jnp.uint32)
    for i in range(N_LIMBS):
        acc = acc.at[..., i : i + N_LIMBS].add(a[..., i : i + 1] * b)
    return _reduce40(acc)


def _carry40(x):
    def step(i, x):
        c = x[..., i] >> LIMB_BITS
        x = x.at[..., i].set(x[..., i] & LIMB_MASK)
        x = x.at[..., i + 1].add(c)
        return x

    return jax.lax.fori_loop(0, 2 * N_LIMBS - 1, step, x)


def _reduce40(x):
    x = _carry40(x)
    lo = x[..., :N_LIMBS]
    # limbs 20+j have weight 2^(260+13j) ≡ 608 * 2^(13j)  (2^260 ≡ 19*2^5)
    hi = x[..., N_LIMBS:]
    lo = lo + hi * 608
    return _carry20(lo)


def fsquare(a):
    return fmul(a, a)


def to_canonical(x):
    """Fully reduce a carried (..., 20) value into [0, p)."""
    p_limbs = jnp.asarray(int_to_limbs(P25519))

    def try_sub(x):
        # limbwise base-2^13 subtraction with borrow; keep only if >= p.
        # Derive the initial carry from x so its sharding/varying type
        # matches the loop body's output under shard_map.
        borrow0 = x[..., 0] * 0
        out0 = x * 0

        def step(i, carry):
            borrow, out = carry
            d = x[..., i] + (1 << LIMB_BITS) - p_limbs[i] - borrow
            digit = d & LIMB_MASK
            borrow_out = (d >> LIMB_BITS) ^ 1  # 1 if we borrowed
            return borrow_out, out.at[..., i].set(digit)

        borrow, out = jax.lax.fori_loop(0, N_LIMBS, step, (borrow0, out0))
        ok = borrow == 0
        return jnp.where(ok[..., None], out, x)

    x = _carry20(x)
    x = try_sub(x)
    x = try_sub(x)
    return x


def feq(a, b):
    """Canonical equality of two carried values."""
    diff = to_canonical(fsub(a, b))
    return jnp.all(diff == 0, axis=-1)


# ---------------------------------------------------------------------------
# Device point arithmetic: extended coordinates (X, Y, Z, T), a = -1
# ---------------------------------------------------------------------------


def _pt_double(X, Y, Z):
    # dbl-2008-hwcd (a=-1); T not needed as doubling input
    A = fsquare(X)
    B = fsquare(Y)
    Csq = fsquare(Z)
    C = fadd(Csq, Csq)
    G = fsub(B, A)  # a=-1: G = aA + B = B - A
    F = fsub(G, C)
    H = fsub(jnp.zeros_like(A), fadd(A, B))  # H = aA - B = -(A+B)
    XY = fadd(X, Y)
    E = fsub(fsquare(XY), fadd(A, B))
    X3 = fmul(E, F)
    Y3 = fmul(G, H)
    T3 = fmul(E, H)
    Z3 = fmul(F, G)
    return X3, Y3, Z3, T3


def _pt_madd(X1, Y1, Z1, T1, x2, y2, t2):
    """Mixed addition with affine (x2, y2), t2 = x2*y2 (unified/complete)."""
    A = fmul(fsub(Y1, X1), fsub(y2, x2))
    B = fmul(fadd(Y1, X1), fadd(y2, x2))
    d2 = jnp.asarray(int_to_limbs(D2_ED))
    C = fmul(fmul(T1, jnp.broadcast_to(d2, T1.shape)), t2)
    D = fadd(Z1, Z1)
    E = fsub(B, A)
    F = fsub(D, C)
    G = fadd(D, C)
    H = fadd(B, A)
    X3 = fmul(E, F)
    Y3 = fmul(G, H)
    T3 = fmul(E, H)
    Z3 = fmul(F, G)
    return X3, Y3, Z3, T3


def straus_verify(table_x, table_y, table_t, bits2, rx, ry):
    """Batched double-scalar ladder + projective comparison.

    table_*: (B, 4, 20) affine Straus table [identity, B, -A, B-A]
    bits2:   (B, N_BITS) uint32 in {0,1,2,3}: 2*bit_k + bit_s (MSB first)
    rx, ry:  (B, 20) affine R
    Returns: (B,) bool — [s]B + [k](-A) == R.
    """
    # Initialize Q = identity from the table's slot 0 (x=0, y=1, t=0) so the
    # loop carry inherits the inputs' sharding/varying type under shard_map.
    X = table_x[:, 0, :]
    Y = table_y[:, 0, :]
    Z = table_y[:, 0, :]  # limbs of 1
    T = table_t[:, 0, :]

    def body(i, carry):
        X, Y, Z, T = carry
        X, Y, Z, T = _pt_double(X, Y, Z)
        sel = bits2[:, i]  # (B,)
        one_hot = (sel[:, None, None] == jnp.arange(4)[None, :, None]).astype(
            jnp.uint32
        )  # (B, 4, 1)
        px = (one_hot * table_x).sum(axis=1).astype(jnp.uint32)
        py = (one_hot * table_y).sum(axis=1).astype(jnp.uint32)
        pt = (one_hot * table_t).sum(axis=1).astype(jnp.uint32)
        return _pt_madd(X, Y, Z, T, px, py, pt)

    X, Y, Z, T = jax.lax.fori_loop(0, N_BITS, body, (X, Y, Z, T))
    # Q == R  <=>  X == rx*Z and Y == ry*Z (R affine)
    ok_x = feq(X, fmul(rx, Z))
    ok_y = feq(Y, fmul(ry, Z))
    return ok_x & ok_y


straus_verify_jit = jax.jit(straus_verify)


# ---------------------------------------------------------------------------
# Device witness binding: table / bits2 / R derivation checks
#
# straus_verify consumes host-precomputed tables and scalar bits; these
# checks re-derive (or verify) every one of those inputs ON DEVICE from the
# raw (pubkey, message, signature) bytes, so the exported verification
# program accepts no unbound witness data. Counterpart of the in-gadget
# derivations inside the reference's `curta_eddsa_verify_sigs_conditional`
# (/root/reference/circuits/builder/verify.rs:248-259) and the challenge
# computation in conversion.rs:22-56.
# ---------------------------------------------------------------------------


_P_LIMBS = int_to_limbs(P25519)
_L_LIMBS = int_to_limbs(L_ORDER)
_D_LIMBS = int_to_limbs(D_ED)
_ONE_LIMBS = int_to_limbs(1)
BASE_T = BASE_POINT[0] * BASE_POINT[1] % P25519
_BX_LIMBS = int_to_limbs(BASE_POINT[0])
_BY_LIMBS = int_to_limbs(BASE_POINT[1])
_BT_LIMBS = int_to_limbs(BASE_T)


def bytes_le_to_limbs(data, n_limbs: int, n_bits: int | None = None):
    """(B, nbytes) uint8 little-endian integer -> (B, n_limbs) 13-bit limbs.
    Bits at/above n_bits are dropped (e.g. the sign bit of a compressed
    point)."""
    B, nbytes = data.shape
    total_bits = n_limbs * LIMB_BITS
    shifts = jnp.arange(8, dtype=jnp.uint32)
    bits = ((data[:, :, None].astype(jnp.uint32) >> shifts[None, None, :]) & 1).reshape(
        B, nbytes * 8
    )
    if n_bits is not None and n_bits < nbytes * 8:
        mask = (jnp.arange(nbytes * 8) < n_bits).astype(jnp.uint32)
        bits = bits * mask[None, :]
    if nbytes * 8 < total_bits:
        bits = jnp.pad(bits, ((0, 0), (0, total_bits - nbytes * 8)))
    else:
        bits = bits[:, :total_bits]
    w = (jnp.uint32(1) << jnp.arange(LIMB_BITS, dtype=jnp.uint32))
    return (
        (bits.reshape(B, n_limbs, LIMB_BITS) * w[None, None, :])
        .sum(axis=-1)
        .astype(jnp.uint32)
    )


def _lt_const(a, c_limbs) -> jnp.ndarray:
    """a < c for canonical base-2^13 limb arrays (a: (B, n), c constant)."""
    n = a.shape[-1]
    c = jnp.asarray(np.asarray(c_limbs, dtype=np.uint32))
    # derive the initial borrow from `a` so its sharding/varying type matches
    # the loop body's output under shard_map
    borrow0 = a[..., 0] * 0

    def step(i, borrow):
        d = a[..., i] + (1 << LIMB_BITS) - c[i] - borrow
        return (d >> LIMB_BITS) ^ 1

    borrow = jax.lax.fori_loop(0, n, step, borrow0)
    return borrow == 1


def on_curve(x, y) -> jnp.ndarray:
    """-x^2 + y^2 == 1 + d x^2 y^2 over GF(2^255-19), batched."""
    x2 = fmul(x, x)
    y2 = fmul(y, y)
    lhs = fsub(y2, x2)
    d = jnp.broadcast_to(jnp.asarray(_D_LIMBS), x.shape)
    one = jnp.broadcast_to(jnp.asarray(_ONE_LIMBS), x.shape)
    rhs = fadd(one, fmul(fmul(d, x2), y2))
    return feq(lhs, rhs)


def _bits_to_limbs(bits, n_limbs: int = N_LIMBS):
    """bits: (B, 253) in {0,1}, MSB-first (entry i = bit 252-i).
    Recompose into canonical 13-bit limbs."""
    pos = 252 - np.arange(N_BITS)
    W = np.zeros((N_BITS, n_limbs), dtype=np.uint32)
    W[np.arange(N_BITS), pos // LIMB_BITS] = np.uint32(1) << (pos % LIMB_BITS)
    return (bits[:, :, None] * jnp.asarray(W)[None, :, :]).sum(axis=1).astype(
        jnp.uint32
    )


def _mul_add_int(q, c_limbs, k):
    """Exact integer q*c + k in base-2^13 limbs (no mod-p folding).
    q: (B, 20) 13-bit limbs; c: (20,) constant; k: (B, 20). -> (B, 40)
    fully carried."""
    B = q.shape[0]
    c = jnp.asarray(np.asarray(c_limbs, dtype=np.uint32))
    acc = jnp.zeros((B, 2 * N_LIMBS), jnp.uint32)
    for i in range(N_LIMBS):
        acc = acc.at[:, i : i + N_LIMBS].add(q[:, i : i + 1] * c[None, :])
    acc = acc.at[:, :N_LIMBS].add(k)
    return _carry40(acc)


def bind_witness(
    table_x, table_y, table_t, bits2, rx, ry,
    sig_r, sig_s, sig_pk, digest_bytes, k_q,
):
    """Per-lane device check that the Straus witness is exactly the one
    derived from (sig_pk, message, signature).

    sig_r/sig_s: (B, 32) uint8 signature halves; sig_pk: (B, 32) uint8
    compressed public key; digest_bytes: (B, 64) uint8 SHA-512(R‖A‖M)
    digest (computed on device by the caller); k_q: (B, 20) witness
    quotient limbs for the mod-L reduction of the challenge.
    Returns (B,) bool."""
    B = rx.shape[0]
    ok = jnp.ones((B,), bool)

    # 0. limb/bit ranges on every witness array
    ok &= jnp.all(table_x <= LIMB_MASK, axis=(1, 2))
    ok &= jnp.all(table_y <= LIMB_MASK, axis=(1, 2))
    ok &= jnp.all(table_t <= LIMB_MASK, axis=(1, 2))
    ok &= jnp.all(rx <= LIMB_MASK, axis=1)
    ok &= jnp.all(ry <= LIMB_MASK, axis=1)
    ok &= jnp.all(k_q <= LIMB_MASK, axis=1)
    ok &= jnp.all(bits2 <= 3, axis=1)

    # 1. R binding: ry is the canonical 255-bit y of sig_r, rx has the
    #    encoded parity and (rx, ry) is on the curve (RFC 8032 decompression
    #    re-checked, not re-done: the witness supplies x, we verify it).
    y_r = bytes_le_to_limbs(sig_r, N_LIMBS, n_bits=255)
    sign_r = (sig_r[:, 31] >> 7).astype(jnp.uint32)
    ok &= _lt_const(y_r, _P_LIMBS)
    ok &= feq(ry, y_r)
    ok &= on_curve(rx, ry)
    crx = to_canonical(rx)
    ok &= (crx[:, 0] & 1) == sign_r

    # 2. Straus table binding: [identity, B, -A, B + (-A)]
    zero = jnp.zeros_like(rx)
    one = jnp.broadcast_to(jnp.asarray(_ONE_LIMBS), rx.shape)
    bx = jnp.broadcast_to(jnp.asarray(_BX_LIMBS), rx.shape)
    by = jnp.broadcast_to(jnp.asarray(_BY_LIMBS), rx.shape)
    bt = jnp.broadcast_to(jnp.asarray(_BT_LIMBS), rx.shape)
    ok &= feq(table_x[:, 0], zero) & feq(table_y[:, 0], one)
    ok &= feq(table_x[:, 1], bx) & feq(table_y[:, 1], by)
    for j in range(4):
        ok &= feq(table_t[:, j], fmul(table_x[:, j], table_y[:, j]))
    # slot 2 = -A: y from the pubkey bytes; negation flips the x parity
    y_a = bytes_le_to_limbs(sig_pk, N_LIMBS, n_bits=255)
    sign_a = (sig_pk[:, 31] >> 7).astype(jnp.uint32)
    ok &= _lt_const(y_a, _P_LIMBS)
    ok &= feq(table_y[:, 2], y_a)
    ok &= on_curve(table_x[:, 2], table_y[:, 2])
    c2x = to_canonical(table_x[:, 2])
    x2_zero = jnp.all(c2x == 0, axis=1)
    ok &= jnp.where(x2_zero, sign_a == 0, (c2x[:, 0] & 1) == (1 - sign_a))
    # slot 3 = slot1 + slot2, checked projectively via unified mixed add
    X3, Y3, Z3, _T3 = _pt_madd(bx, by, one, bt, table_x[:, 2], table_y[:, 2], table_t[:, 2])
    ok &= feq(fmul(table_x[:, 3], Z3), X3)
    ok &= feq(fmul(table_y[:, 3], Z3), Y3)

    # 3. s binding: recompose the s-bits of bits2, compare to sig_s; s < L
    s_limbs = bytes_le_to_limbs(sig_s, N_LIMBS)
    ok &= _lt_const(s_limbs, _L_LIMBS)
    s_rec = _bits_to_limbs(bits2 & 1)
    ok &= jnp.all(s_rec == s_limbs, axis=1)

    # 4. challenge binding: h = SHA-512(R‖A‖M) as a little-endian integer
    #    must equal k_q * L + k with k < L, where k is recomposed from the
    #    k-bits of bits2 — i.e. k = h mod L, verified without division.
    h_limbs = bytes_le_to_limbs(digest_bytes, 2 * N_LIMBS)
    k_rec = _bits_to_limbs((bits2 >> 1) & 1)
    ok &= _lt_const(k_rec, _L_LIMBS)
    lhs = _mul_add_int(k_q, _L_LIMBS, k_rec)
    ok &= jnp.all(lhs == h_limbs, axis=1)
    return ok


def verify_bound(
    table_x, table_y, table_t, bits2, rx, ry,
    sig_r, sig_s, sig_pk, messages, msg_len, k_q,
):
    """Full device verification: derive the SHA-512 challenge from the raw
    bytes, bind every witness array, then run the Straus ladder.

    messages: (B, max_len) uint8 zero-padded; msg_len: (B,) uint32. The
    digest input R‖A‖M is assembled on device so the verified message is
    exactly the lane's message buffer."""
    from . import sha512 as sha512mod

    data = jnp.concatenate([sig_r, sig_pk, messages], axis=1)
    byte_len = msg_len.astype(jnp.uint32) + 64
    max_total = 64 + messages.shape[1]
    n_blocks = (max_total + 17 + 127) // 128
    d_lo, d_hi = sha512mod.sha512_bytes_var(data, byte_len, n_blocks)
    digest_bytes = sha512mod.digest_words_to_bytes_dev(d_lo, d_hi)
    bound = bind_witness(
        table_x, table_y, table_t, bits2, rx, ry,
        sig_r, sig_s, sig_pk, digest_bytes, k_q,
    )
    ladder = straus_verify(table_x, table_y, table_t, bits2, rx, ry)
    return bound & ladder


# ---------------------------------------------------------------------------
# Host-side batch preparation + end-to-end entry point
# ---------------------------------------------------------------------------


def prepare_batch(pubkeys: list[bytes], msgs: list[bytes], sigs: list[bytes]):
    """Host witness prep: decompress, challenge scalars, Straus tables.

    Raises ValueError on malformed points/scalars (callers pre-verify
    signatures natively, so this is defense in depth)."""
    B = len(pubkeys)
    table_x = np.zeros((B, 4, N_LIMBS), dtype=np.uint32)
    table_y = np.zeros((B, 4, N_LIMBS), dtype=np.uint32)
    table_t = np.zeros((B, 4, N_LIMBS), dtype=np.uint32)
    bits2 = np.zeros((B, N_BITS), dtype=np.uint32)
    rx = np.zeros((B, N_LIMBS), dtype=np.uint32)
    ry = np.zeros((B, N_LIMBS), dtype=np.uint32)
    for i, (pk, msg, sig) in enumerate(zip(pubkeys, msgs, sigs)):
        A = decompress(pk)
        R = decompress(sig[:32])
        if A is None or R is None:
            raise ValueError(f"lane {i}: invalid point encoding")
        s = int.from_bytes(sig[32:], "little")
        if s >= L_ORDER:
            raise ValueError(f"lane {i}: scalar s out of range")
        k = (
            int.from_bytes(hashlib.sha512(sig[:32] + pk + msg).digest(), "little")
            % L_ORDER
        )
        negA = pt_neg(A)
        b_negA = pt_add(BASE_POINT, negA)
        pts = [(0, 1), BASE_POINT, negA, b_negA]
        for j, (x, y) in enumerate(pts):
            table_x[i, j] = int_to_limbs(x)
            table_y[i, j] = int_to_limbs(y)
            table_t[i, j] = int_to_limbs(x * y % P25519)
        for b in range(N_BITS):
            pos = N_BITS - 1 - b
            bits2[i, b] = ((k >> pos) & 1) * 2 + ((s >> pos) & 1)
        rx[i] = int_to_limbs(R[0])
        ry[i] = int_to_limbs(R[1])
    return (
        jnp.asarray(table_x),
        jnp.asarray(table_y),
        jnp.asarray(table_t),
        jnp.asarray(bits2),
        jnp.asarray(rx),
        jnp.asarray(ry),
    )


def prepare_binding(pubkeys: list[bytes], msgs: list[bytes], sigs: list[bytes]):
    """Host prep of the binding inputs: raw signature halves, pubkey bytes,
    and the mod-L quotient witness for the challenge reduction."""
    B = len(pubkeys)
    sig_r = np.zeros((B, 32), dtype=np.uint8)
    sig_s = np.zeros((B, 32), dtype=np.uint8)
    sig_pk = np.zeros((B, 32), dtype=np.uint8)
    k_q = np.zeros((B, N_LIMBS), dtype=np.uint32)
    for i, (pk, msg, sig) in enumerate(zip(pubkeys, msgs, sigs)):
        sig_r[i] = np.frombuffer(sig[:32], dtype=np.uint8)
        sig_s[i] = np.frombuffer(sig[32:], dtype=np.uint8)
        sig_pk[i] = np.frombuffer(pk, dtype=np.uint8)
        h = int.from_bytes(hashlib.sha512(sig[:32] + pk + msg).digest(), "little")
        k_q[i] = int_to_limbs(h // L_ORDER)
    return (
        jnp.asarray(sig_r),
        jnp.asarray(sig_s),
        jnp.asarray(sig_pk),
        jnp.asarray(k_q),
    )


def verify_batch(pubkeys: list[bytes], msgs: list[bytes], sigs: list[bytes]):
    """End-to-end: returns np.ndarray of bool, one per lane."""
    args = prepare_batch(pubkeys, msgs, sigs)
    return np.asarray(straus_verify_jit(*args))


def verify_batch_bound(
    pubkeys: list[bytes], msgs: list[bytes], sigs: list[bytes], max_len: int = 124
):
    """End-to-end with full on-device witness binding (messages zero-padded
    to max_len). Returns np.ndarray of bool, one per lane."""
    args = prepare_batch(pubkeys, msgs, sigs)
    sig_r, sig_s, sig_pk, k_q = prepare_binding(pubkeys, msgs, sigs)
    B = len(msgs)
    m = np.zeros((B, max_len), dtype=np.uint8)
    mlen = np.zeros((B,), dtype=np.uint32)
    for i, msg in enumerate(msgs):
        m[i, : len(msg)] = np.frombuffer(msg, dtype=np.uint8)
        mlen[i] = len(msg)
    fn = jax.jit(verify_bound)
    return np.asarray(
        fn(*args, sig_r, sig_s, sig_pk, jnp.asarray(m), jnp.asarray(mlen), k_q)
    )
