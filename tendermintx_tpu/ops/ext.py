"""Quadratic extension field GF(p^2) = GF(p)[X] / (X^2 - 7) over Goldilocks.

7 is a quadratic non-residue mod p (verified by Euler's criterion), matching
the degree-2 extension the reference's proof system uses for soundness of
random challenges (SURVEY.md §6: "Goldilocks, D=2 extension"). Elements are
pairs (c0, c1) of base-field GF arrays representing c0 + c1·X.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .goldilocks import GF, P

W = 7  # non-residue defining the extension


@jax.tree_util.register_pytree_node_class
class GF2:
    """Array of GF(p^2) elements as a pair of base-field arrays."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: GF, c1: GF):
        self.c0 = c0
        self.c1 = c1

    def tree_flatten(self):
        return (self.c0, self.c1), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors --
    @classmethod
    def from_base(cls, x: GF):
        return cls(x, GF.zeros(x.shape))

    @classmethod
    def from_ints(cls, c0, c1):
        return cls(GF.from_ints(c0), GF.from_ints(c1))

    @classmethod
    def zeros(cls, shape):
        return cls(GF.zeros(shape), GF.zeros(shape))

    @classmethod
    def ones(cls, shape):
        return cls(GF.ones(shape), GF.zeros(shape))

    @property
    def shape(self):
        return self.c0.shape

    def to_ints(self):
        return self.c0.to_ints(), self.c1.to_ints()

    # -- arithmetic --
    def __add__(self, o):
        return GF2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return GF2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return GF2(-self.c0, -self.c1)

    def __mul__(self, o):
        # (a0 + a1 X)(b0 + b1 X) = a0 b0 + W a1 b1 + (a0 b1 + a1 b0) X
        a0b0 = self.c0 * o.c0
        a1b1 = self.c1 * o.c1
        a0b1 = self.c0 * o.c1
        a1b0 = self.c1 * o.c0
        return GF2(a0b0 + a1b1.mul_small(W), a0b1 + a1b0)

    def scale(self, s: GF):
        return GF2(self.c0 * s, self.c1 * s)

    def square(self):
        return self * self

    def inv(self):
        # 1/(a0 + a1 X) = (a0 - a1 X) / (a0^2 - W a1^2)
        norm = self.c0.square() - self.c1.square().mul_small(W)
        ninv = norm.inv()
        return GF2(self.c0 * ninv, -(self.c1 * ninv))

    def pow(self, e: int):
        if e == 0:
            return GF2.ones(self.shape)
        bits = bin(e)[2:]
        if len(bits) <= 8:
            r = self
            for bit in bits[1:]:
                r = r.square()
                if bit == "1":
                    r = r * self
            return r
        bit_arr = jnp.asarray([int(b) for b in bits[1:]], dtype=jnp.uint32)

        def body(i, r):
            r = r.square()
            m = r * self
            take = bit_arr[i] == 1
            return GF2.where(take, m, r)

        return jax.lax.fori_loop(0, len(bits) - 1, body, self)

    @classmethod
    def where(cls, cond, a, b):
        return cls(GF.where(cond, a.c0, b.c0), GF.where(cond, a.c1, b.c1))

    def equal(self, o):
        return self.c0.equal(o.c0) & self.c1.equal(o.c1)

    def __getitem__(self, idx):
        return GF2(self.c0[idx], self.c1[idx])

    def reshape(self, *shape):
        return GF2(self.c0.reshape(*shape), self.c1.reshape(*shape))

    def sum(self, axis=None):
        return GF2(self.c0.sum(axis), self.c1.sum(axis))

    @classmethod
    def stack(cls, parts, axis=0):
        return cls(
            GF.stack([p.c0 for p in parts], axis),
            GF.stack([p.c1 for p in parts], axis),
        )

    @classmethod
    def concatenate(cls, parts, axis=0):
        return cls(
            GF.concatenate([p.c0 for p in parts], axis),
            GF.concatenate([p.c1 for p in parts], axis),
        )

    def __repr__(self):
        return f"GF2(shape={self.shape})"


# Host-side (Python int) oracle arithmetic for GF(p^2), used by the verifier
# and the Fiat-Shamir challenger, which run sequentially on host.


def ext_mul(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + W * a1 * b1) % P, (a0 * b1 + a1 * b0) % P)


def ext_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def ext_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def ext_inv(a):
    norm = (a[0] * a[0] - W * a[1] * a[1]) % P
    ninv = pow(norm, P - 2, P)
    return ((a[0] * ninv) % P, (-a[1] * ninv) % P)


def ext_pow(a, e: int):
    r = (1, 0)
    base = a
    while e:
        if e & 1:
            r = ext_mul(r, base)
        base = ext_mul(base, base)
        e >>= 1
    return r
