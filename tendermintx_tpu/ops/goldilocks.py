"""Goldilocks field (p = 2**64 - 2**32 + 1) arithmetic for TPU.

TPU vector units have no native 64-bit integer multiply, so field elements are
represented as pairs of uint32 limbs ``(lo, hi)`` and all arithmetic is built
from 32-bit operations (with 16-bit splitting for products). The same code path
runs on CPU (tests) and TPU (production) — no x64 mode required.

This is the TPU-native equivalent of the reference's external ``plonky2_field``
crate (see /root/reference Cargo.lock: plonky2_field; consumed throughout
circuits/, e.g. circuits/input/mod.rs:12, circuits/step.rs:78). The reduction
strategy mirrors the classic Goldilocks identities 2**64 ≡ 2**32 - 1 and
2**96 ≡ -1 (mod p), re-derived here for a 32-bit-limb machine.

All public functions are shape-polymorphic and jit-friendly: inputs are
broadcastable uint32 arrays. Values are kept canonical (< p) at function
boundaries.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 0xFFFFFFFF00000001  # 2**64 - 2**32 + 1
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
EPSILON = 0xFFFFFFFF  # 2**32 - 1 == 2**64 mod p
# Multiplicative group generator (standard for Goldilocks).
MULTIPLICATIVE_GENERATOR = 7
# 2-adicity: p - 1 = 2**32 * (2**32 - 1).
TWO_ADICITY = 32

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# 32-bit primitive helpers (all return uint32 arrays)
# ---------------------------------------------------------------------------


def _mul32(a, b):
    """Full 32x32 -> 64 bit product, returned as (lo32, hi32) uint32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0          # <= (2^16-1)^2 < 2^32, exact in uint32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # mid = p01 + p10, may carry one bit out of 32
    mid = p01 + p10
    mid_carry = (mid < p01).astype(_U32)  # 1 if wrapped
    lo = p00 + (mid << 16)
    lo_carry = (lo < p00).astype(_U32)
    hi = p11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    return lo, hi


def _add64(a_lo, a_hi, b_lo, b_hi):
    """(a + b) mod 2**128-ish: returns (lo, hi, carry_out) as uint32."""
    lo = a_lo + b_lo
    c0 = (lo < a_lo).astype(_U32)
    hi1 = a_hi + b_hi
    c1 = (hi1 < a_hi).astype(_U32)
    hi = hi1 + c0
    c2 = (hi < hi1).astype(_U32)
    return lo, hi, c1 | c2


def _sub64(a_lo, a_hi, b_lo, b_hi):
    """(a - b) wrapping 64-bit: returns (lo, hi, borrow_out) as uint32."""
    lo = a_lo - b_lo
    b0 = (a_lo < b_lo).astype(_U32)
    hi1 = a_hi - b_hi
    b1 = (a_hi < b_hi).astype(_U32)
    hi = hi1 - b0
    b2 = ((hi1 < b0)).astype(_U32)
    return lo, hi, b1 | b2


def _geq_p(lo, hi):
    """value >= p (as boolean array)."""
    return (hi == P_HI) & (lo >= P_LO)


def _cond_sub_p(lo, hi):
    """Subtract p once if value >= p. Input < 2**64; output canonical if
    input < 2p."""
    need = _geq_p(lo, hi)
    s_lo, s_hi, _ = _sub64(lo, hi, _u32(P_LO), _u32(P_HI))
    return jnp.where(need, s_lo, lo), jnp.where(need, s_hi, hi)


# ---------------------------------------------------------------------------
# Field operations on (lo, hi) uint32 pairs
# ---------------------------------------------------------------------------


def add(a_lo, a_hi, b_lo, b_hi):
    """Field addition; inputs canonical, output canonical."""
    lo, hi, carry = _add64(a_lo, a_hi, b_lo, b_hi)
    # carry => result = wrapped + 2**64 ≡ wrapped + (2**32 - 1) (mod p),
    # and the adjusted value is exactly (a+b) - p < p (no further overflow).
    adj_lo, adj_hi, _ = _add64(lo, hi, _u32(EPSILON), _u32(0))
    lo = jnp.where(carry.astype(bool), adj_lo, lo)
    hi = jnp.where(carry.astype(bool), adj_hi, hi)
    return _cond_sub_p(lo, hi)


def sub(a_lo, a_hi, b_lo, b_hi):
    """Field subtraction; inputs canonical, output canonical."""
    lo, hi, borrow = _sub64(a_lo, a_hi, b_lo, b_hi)
    # borrow => wrapped = a - b + 2**64 ≡ a - b + (2**32 - 1) (mod p), so
    # subtract EPSILON to correct; cannot borrow again (wrapped >= 2**64 - b
    # > 2**32 - 1 since b < p).
    adj_lo, adj_hi, _ = _sub64(lo, hi, _u32(EPSILON), _u32(0))
    lo = jnp.where(borrow.astype(bool), adj_lo, lo)
    hi = jnp.where(borrow.astype(bool), adj_hi, hi)
    return lo, hi


def neg(a_lo, a_hi):
    zero = (a_lo == 0) & (a_hi == 0)
    lo, hi, _ = _sub64(_u32(P_LO), _u32(P_HI), a_lo, a_hi)
    return jnp.where(zero, _u32(0), lo), jnp.where(zero, _u32(0), hi)


def _mul_wide(a_lo, a_hi, b_lo, b_hi):
    """Full 64x64 -> 128-bit product as four uint32 limbs r0..r3 (LSB first)."""
    l00, h00 = _mul32(a_lo, b_lo)
    l01, h01 = _mul32(a_lo, b_hi)
    l10, h10 = _mul32(a_hi, b_lo)
    l11, h11 = _mul32(a_hi, b_hi)

    r0 = l00

    # r1 = h00 + l01 + l10 (carries into r2)
    r1 = h00 + l01
    c1a = (r1 < h00).astype(_U32)
    r1b = r1 + l10
    c1b = (r1b < r1).astype(_U32)
    r1 = r1b
    carry_r2 = c1a + c1b

    # r2 = h01 + h10 + l11 + carry_r2 (carries into r3)
    r2 = h01 + h10
    c2a = (r2 < h01).astype(_U32)
    r2b = r2 + l11
    c2b = (r2b < r2).astype(_U32)
    r2c = r2b + carry_r2
    c2c = (r2c < r2b).astype(_U32)
    r2 = r2c
    carry_r3 = c2a + c2b + c2c

    r3 = h11 + carry_r3
    return r0, r1, r2, r3


def reduce128(r0, r1, r2, r3):
    """Reduce a 128-bit value (uint32 limbs, LSB first) modulo p.

    Uses 2**96 ≡ -1 and 2**64 ≡ 2**32 - 1 (mod p):
        x ≡ x_lo - r3 + r2 * (2**32 - 1)  (mod p)
    Output canonical.
    """
    # Step 1: t = x_lo - r3 (64-bit), adjust by -EPSILON on borrow.
    t_lo, t_hi, borrow = _sub64(r0, r1, r3, _u32(0))
    a_lo, a_hi, _ = _sub64(t_lo, t_hi, _u32(EPSILON), _u32(0))
    t_lo = jnp.where(borrow.astype(bool), a_lo, t_lo)
    t_hi = jnp.where(borrow.astype(bool), a_hi, t_hi)

    # Step 2: add r2 * (2**32 - 1) = (r2 << 32) - r2.
    m_lo = _u32(0) - r2          # (2**32 - r2) mod 2**32
    m_hi = r2 - (r2 != 0).astype(_U32)
    s_lo, s_hi, carry = _add64(t_lo, t_hi, m_lo, m_hi)
    a_lo, a_hi, _ = _add64(s_lo, s_hi, _u32(EPSILON), _u32(0))
    s_lo = jnp.where(carry.astype(bool), a_lo, s_lo)
    s_hi = jnp.where(carry.astype(bool), a_hi, s_hi)

    return _cond_sub_p(s_lo, s_hi)


def mul(a_lo, a_hi, b_lo, b_hi):
    """Field multiplication; inputs canonical, output canonical."""
    return reduce128(*_mul_wide(a_lo, a_hi, b_lo, b_hi))


def square(a_lo, a_hi):
    return mul(a_lo, a_hi, a_lo, a_hi)


def mul_u32(a_lo, a_hi, c: int):
    """Multiply by a small uint32 constant (cheaper: 96-bit product)."""
    c = _u32(np.uint32(c))
    l0, h0 = _mul32(a_lo, c)
    l1, h1 = _mul32(a_hi, c)
    r0 = l0
    r1 = h0 + l1
    c1 = (r1 < h0).astype(_U32)
    r2 = h1 + c1
    return reduce128(r0, r1, r2, _u32(jnp.zeros_like(r2)))


def mul_pow32(a_lo, a_hi):
    """Multiply by 2**32 (limb shift + reduction): much cheaper than mul."""
    zero = jnp.zeros_like(a_lo)
    return reduce128(zero, a_lo, a_hi, zero)


def pow_const(a_lo, a_hi, e: int):
    """Raise to a fixed Python-int power.

    Short exponents are unrolled; long ones run square-and-multiply under
    ``lax.fori_loop`` (XLA compile time blows up super-linearly with unrolled
    field-op chain depth, so deep chains must be rolled loops).
    """
    if e == 0:
        one_lo = jnp.full_like(a_lo, 1)
        one_hi = jnp.zeros_like(a_hi)
        return one_lo, one_hi
    bits = bin(e)[2:]
    if len(bits) <= 8:
        r_lo, r_hi = a_lo, a_hi
        for bit in bits[1:]:
            r_lo, r_hi = square(r_lo, r_hi)
            if bit == "1":
                r_lo, r_hi = mul(r_lo, r_hi, a_lo, a_hi)
        return r_lo, r_hi

    bit_arr = jnp.asarray([int(b) for b in bits[1:]], dtype=jnp.uint32)

    def body(i, carry):
        r_lo, r_hi = carry
        r_lo, r_hi = square(r_lo, r_hi)
        m_lo, m_hi = mul(r_lo, r_hi, a_lo, a_hi)
        take = (bit_arr[i] == 1)
        return jnp.where(take, m_lo, r_lo), jnp.where(take, m_hi, r_hi)

    r_lo, r_hi = jax.lax.fori_loop(0, len(bits) - 1, body, (a_lo, a_hi))
    return r_lo, r_hi


def inv(a_lo, a_hi):
    """Field inverse via Fermat: a**(p-2). inv(0) = 0 (by convention)."""
    # Addition-chain-free exponentiation; p-2 has 64 bits -> ~96 muls.
    return pow_const(a_lo, a_hi, P - 2)


def canonicalize(lo, hi):
    return _cond_sub_p(lo, hi)


# ---------------------------------------------------------------------------
# Host-side conversion helpers (numpy, not traced)
# ---------------------------------------------------------------------------


def from_int_array(x) -> tuple[np.ndarray, np.ndarray]:
    """Python ints / object array / uint64 array -> (lo, hi) uint32 arrays."""
    arr = np.asarray(x, dtype=object)
    flat = [int(v) % P for v in arr.reshape(-1).tolist()]
    u64 = np.array(flat, dtype=np.uint64).reshape(arr.shape)
    lo = (u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (u64 >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def fetch_ints_many(arrs) -> list[np.ndarray]:
    """Fetch several GF arrays as Python-int object arrays with ONE
    device→host transfer (per-array fetches are latency-bound through the
    remote-TPU relay). Accepts a list of GF; returns matching object
    arrays."""
    import jax.numpy as jnp

    flats = []
    shapes = []
    for a in arrs:
        shapes.append(a.shape)
        flats.append(a.lo.reshape(-1))
        flats.append(a.hi.reshape(-1))
    joined = np.asarray(jnp.concatenate(flats)) if flats else np.zeros(0)
    out = []
    off = 0
    for shp in shapes:
        size = 1
        for d in shp:
            size *= int(d)
        lo = joined[off : off + size].reshape(shp)
        off += size
        hi = joined[off : off + size].reshape(shp)
        off += size
        out.append(to_int_array(lo, hi))
    return out


def to_int_array(lo, hi) -> np.ndarray:
    """(lo, hi) uint32 arrays -> object array of Python ints."""
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    flat = [
        int(l) | (int(h) << 32)
        for l, h in zip(lo.reshape(-1).tolist(), hi.reshape(-1).tolist())
    ]
    out = np.empty(lo.shape, dtype=object)
    out.reshape(-1)[:] = flat
    return out


# ---------------------------------------------------------------------------
# GF: a thin pytree wrapper for ergonomic use
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class GF:
    """Array of Goldilocks field elements (struct-of-arrays uint32 limbs)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors --
    @classmethod
    def from_ints(cls, x):
        lo, hi = from_int_array(x)
        return cls(jnp.asarray(lo), jnp.asarray(hi))

    @classmethod
    def zeros(cls, shape):
        return cls(jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))

    @classmethod
    def ones(cls, shape):
        return cls(jnp.ones(shape, _U32), jnp.zeros(shape, _U32))

    @classmethod
    def from_u32(cls, x):
        x = jnp.asarray(x, dtype=_U32)
        return cls(x, jnp.zeros_like(x))

    # -- introspection --
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def to_ints(self):
        return to_int_array(np.asarray(self.lo), np.asarray(self.hi))

    # -- arithmetic --
    def __add__(self, other):
        return GF(*add(self.lo, self.hi, other.lo, other.hi))

    def __sub__(self, other):
        return GF(*sub(self.lo, self.hi, other.lo, other.hi))

    def __mul__(self, other):
        return GF(*mul(self.lo, self.hi, other.lo, other.hi))

    def __neg__(self):
        return GF(*neg(self.lo, self.hi))

    def square(self):
        return GF(*square(self.lo, self.hi))

    def inv(self):
        return GF(*inv(self.lo, self.hi))

    def pow(self, e: int):
        return GF(*pow_const(self.lo, self.hi, e))

    def mul_small(self, c: int):
        return GF(*mul_u32(self.lo, self.hi, c))

    def cmul(self, c: int):
        """Multiply by a compile-time constant, using the cheapest path
        (keeps XLA graphs small — constraint systems are mostly constant
        multiplications)."""
        c = c % P
        if c == 0:
            return GF.zeros(self.shape)
        if c == 1:
            return self
        if c < 1 << 32:
            return self.mul_small(c)
        if c == 1 << 32:
            return GF(*mul_pow32(self.lo, self.hi))
        c_lo = jnp.full_like(self.lo, np.uint32(c & 0xFFFFFFFF))
        c_hi = jnp.full_like(self.hi, np.uint32(c >> 32))
        return GF(*mul(self.lo, self.hi, c_lo, c_hi))

    def equal(self, other):
        return (self.lo == other.lo) & (self.hi == other.hi)

    def is_zero(self):
        return (self.lo == 0) & (self.hi == 0)

    # -- structural ops --
    def __getitem__(self, idx):
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape):
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def broadcast_to(self, shape):
        return GF(jnp.broadcast_to(self.lo, shape), jnp.broadcast_to(self.hi, shape))

    @classmethod
    def concatenate(cls, parts, axis=0):
        return cls(
            jnp.concatenate([p.lo for p in parts], axis=axis),
            jnp.concatenate([p.hi for p in parts], axis=axis),
        )

    @classmethod
    def stack(cls, parts, axis=0):
        return cls(
            jnp.stack([p.lo for p in parts], axis=axis),
            jnp.stack([p.hi for p in parts], axis=axis),
        )

    @classmethod
    def where(cls, cond, a, b):
        return cls(jnp.where(cond, a.lo, b.lo), jnp.where(cond, a.hi, b.hi))

    def sum(self, axis=None):
        """Field sum along an axis via fori_loop accumulation.

        Deliberately NOT a slicing halving-tree: XLA fuses slices of deep
        producer expressions by duplicating the producer per slice, which
        makes compile time explode (hours) for sums over constraint
        expressions. The loop materializes the operand once and runs n-1
        sequential adds — negligible at our reduction widths (<= ~128)."""
        if axis is None:
            flat = self.reshape(-1)
            return flat.sum(axis=0)
        lo = jnp.moveaxis(self.lo, axis, 0)
        hi = jnp.moveaxis(self.hi, axis, 0)
        n = lo.shape[0]
        if n == 1:
            return GF(lo[0], hi[0])

        def body(i, acc):
            return add(acc[0], acc[1], lo[i], hi[i])

        out_lo, out_hi = jax.lax.fori_loop(1, n, body, (lo[0], hi[0]))
        return GF(out_lo, out_hi)

    def __repr__(self):
        return f"GF(shape={self.shape})"
