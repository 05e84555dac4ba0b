"""Goldilocks field: randomized + edge-case tests against Python big-int oracle."""

import jax
import numpy as np
import pytest

from tendermintx_tpu.ops import goldilocks as gl
from tendermintx_tpu.ops.goldilocks import GF, P

rng = np.random.default_rng(1234)


def rand_elems(n):
    return [int(rng.integers(0, 2**63)) * 2 + int(rng.integers(0, 2)) for _ in range(n)]


EDGE = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, 2**63, (2**64 - 1) % P]


def as_gf(vals):
    return GF.from_ints(np.array(vals, dtype=object))


_add = jax.jit(lambda a, b: a + b)
_sub = jax.jit(lambda a, b: a - b)
_mul = jax.jit(lambda a, b: a * b)
_neg = jax.jit(lambda a: -a)
_square = jax.jit(lambda a: a.square())
_inv = jax.jit(lambda a: a.inv())


def test_binary_ops_random():
    a_vals = [v % P for v in (EDGE + rand_elems(500))]
    b_vals = [v % P for v in (list(reversed(EDGE)) + rand_elems(500))]
    a, b = as_gf(a_vals), as_gf(b_vals)
    for f, pyop in [
        (_add, lambda x, y: (x + y) % P),
        (_sub, lambda x, y: (x - y) % P),
        (_mul, lambda x, y: (x * y) % P),
    ]:
        got = list(f(a, b).to_ints())
        want = [pyop(x, y) for x, y in zip(a_vals, b_vals)]
        assert got == want


def test_edge_pairs_exhaustive():
    # all ordered pairs of edge values through every op, fully vectorized
    xs = [x for x in EDGE for _ in EDGE]
    ys = [y for _ in EDGE for y in EDGE]
    a, b = as_gf(xs), as_gf(ys)
    assert list(_add(a, b).to_ints()) == [(x + y) % P for x, y in zip(xs, ys)]
    assert list(_sub(a, b).to_ints()) == [(x - y) % P for x, y in zip(xs, ys)]
    assert list(_mul(a, b).to_ints()) == [(x * y) % P for x, y in zip(xs, ys)]


def test_neg_square_inv():
    vals = EDGE + [v % P for v in rand_elems(100)]
    a = as_gf(vals)
    assert list(_neg(a).to_ints()) == [(-x) % P for x in vals]
    assert list(_square(a).to_ints()) == [(x * x) % P for x in vals]
    inv = _inv(a).to_ints()
    for x, ix in zip(vals, inv):
        if x == 0:
            assert ix == 0
        else:
            assert (x * ix) % P == 1


def test_pow_and_mul_small():
    vals = [v % P for v in rand_elems(50)]
    a = as_gf(vals)
    p7 = jax.jit(lambda x: x.pow(7))
    assert list(p7(a).to_ints()) == [pow(x, 7, P) for x in vals]
    p0 = jax.jit(lambda x: x.pow(0))
    assert list(p0(a).to_ints()) == [1] * len(vals)
    c = 0xDEADBEEF
    ms = jax.jit(lambda x: x.mul_small(c))
    assert list(ms(a).to_ints()) == [(x * c) % P for x in vals]


def test_sum_tree_reduction():
    vals = [v % P for v in rand_elems(37)]
    a = as_gf(vals)
    s0 = jax.jit(lambda x: x.sum(axis=0))
    assert s0(a).to_ints() == sum(vals) % P
    m = as_gf(np.array([v % P for v in rand_elems(12)], dtype=object).reshape(3, 4))
    s1 = jax.jit(lambda x: x.sum(axis=1))
    want = [sum(row) % P for row in m.to_ints().tolist()]
    assert list(s1(m).to_ints()) == want


def test_generator_order():
    g = as_gf([gl.MULTIPLICATIVE_GENERATOR])

    @jax.jit
    def f(g):
        a = g.pow((P - 1) // 2)
        w = g.pow((P - 1) // (1 << 32))
        return a, w.pow(1 << 32), w.pow(1 << 31)

    a, w32, w31 = f(g)
    assert a.to_ints()[0] == P - 1
    assert w32.to_ints()[0] == 1
    assert w31.to_ints()[0] == P - 1


def test_jit_compat():
    vals = [v % P for v in rand_elems(64)]
    a = as_gf(vals)
    b = as_gf(list(reversed(vals)))

    @jax.jit
    def f(x, y):
        return x * y + x

    out = f(a, b)
    want = [(x * y + x) % P for x, y in zip(vals, reversed(vals))]
    assert list(out.to_ints()) == want
