"""GF(p^2) extension field tests against Python-int oracle."""

import jax
import numpy as np

from tendermintx_tpu.ops.ext import GF2, ext_inv, ext_mul, ext_pow
from tendermintx_tpu.ops.goldilocks import P

rng = np.random.default_rng(42)


def rand_pairs(n):
    return [(int(rng.integers(0, 2**63)) % P, int(rng.integers(0, 2**63)) % P) for _ in range(n)]


def as_gf2(pairs):
    return GF2.from_ints(
        np.array([p[0] for p in pairs], dtype=object),
        np.array([p[1] for p in pairs], dtype=object),
    )


def to_pairs(x: GF2):
    c0, c1 = x.to_ints()
    return list(zip(c0.tolist(), c1.tolist()))


def test_mul_matches_oracle():
    a_p, b_p = rand_pairs(100), rand_pairs(100)
    a, b = as_gf2(a_p), as_gf2(b_p)
    got = to_pairs(jax.jit(lambda a, b: a * b)(a, b))
    want = [ext_mul(x, y) for x, y in zip(a_p, b_p)]
    assert got == want


def test_inv_and_pow():
    a_p = rand_pairs(32)
    a = as_gf2(a_p)
    inv = to_pairs(jax.jit(lambda a: a.inv())(a))
    assert inv == [ext_inv(x) for x in a_p]
    for x, ix in zip(a_p, inv):
        assert ext_mul(x, ix) == (1, 0)
    e = 0xABCDEF0123
    got = to_pairs(jax.jit(lambda a: a.pow(e))(a))
    assert got == [ext_pow(x, e) for x in a_p]


def test_mul_group_order():
    # GF(p^2)* has order p^2 - 1
    a_p = rand_pairs(8)
    a = as_gf2(a_p)
    got = to_pairs(jax.jit(lambda a: a.pow(P * P - 1))(a))
    assert all(g == (1, 0) for g in got)
