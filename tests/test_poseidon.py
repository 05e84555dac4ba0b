"""Poseidon: JAX batched permutation vs Python-int oracle; sponge semantics."""

import jax
import numpy as np

from tendermintx_tpu.ops import poseidon as ps
from tendermintx_tpu.ops.goldilocks import GF, P

rng = np.random.default_rng(7)


def rand_states(b):
    return [[int(rng.integers(0, 2**63)) % P for _ in range(ps.WIDTH)] for _ in range(b)]


def test_permute_matches_oracle():
    states = rand_states(5) + [[0] * 12, [1] * 12, [P - 1] * 12]
    x = GF.from_ints(np.array(states, dtype=object))
    out = jax.jit(ps.permute)(x).to_ints().tolist()
    want = [ps.permute_ints(s) for s in states]
    assert out == want


def test_permutation_is_bijective_sanity():
    # distinct inputs -> distinct outputs (trivial collision check)
    states = rand_states(50)
    x = GF.from_ints(np.array(states, dtype=object))
    out = jax.jit(ps.permute)(x).to_ints().tolist()
    assert len({tuple(o) for o in out}) == 50


def test_hash_and_compress_match_oracle():
    for L in (4, 8, 11, 16, 20):
        inputs = [[int(rng.integers(0, 2**63)) % P for _ in range(L)] for _ in range(3)]
        x = GF.from_ints(np.array(inputs, dtype=object))
        got = jax.jit(ps.hash_no_pad)(x).to_ints().tolist()
        want = [ps.hash_ints(row) for row in inputs]
        assert got == want, f"L={L}"
    l = [[int(rng.integers(0, 2**63)) % P for _ in range(4)] for _ in range(3)]
    r = [[int(rng.integers(0, 2**63)) % P for _ in range(4)] for _ in range(3)]
    got = jax.jit(ps.two_to_one)(
        GF.from_ints(np.array(l, dtype=object)), GF.from_ints(np.array(r, dtype=object))
    ).to_ints().tolist()
    want = [ps.two_to_one_ints(a, b) for a, b in zip(l, r)]
    assert got == want


import pytest


@pytest.mark.slow  # ~18 s of native minor-crunching
def test_mds_property_exhaustive():
    """Every square submatrix of the MDS matrix is nonsingular (the MDS
    property), via the native exhaustive minor check (~2.7M determinants)."""
    from tendermintx_tpu.utils.native import mds_check_native

    ok = mds_check_native(ps.mds_matrix())
    if ok is None:
        pytest.skip("native core unavailable")
    assert ok


def test_mds_linear_layer_subspace_trail_resistance():
    """The MDS property alone does not rule out invariant/iterative
    subspace trails through the 22 partial rounds (Grassi et al. — the
    check the published Poseidon scripts run alongside the MDS minors).
    Sufficient condition verified here: char(M) is irreducible over GF(p),
    so M has no proper invariant subspace at all (min poly == char poly,
    irreducible), hence no infinitely long subspace trail exists for the
    linear layer. Also sanity-checks the char poly via Cayley–Hamilton and
    the irreducibility tester against known (ir)reducible polynomials."""
    from tendermintx_tpu.ops.ext import W
    from tendermintx_tpu.ops.linear_layer_check import (
        charpoly,
        is_irreducible,
        linear_layer_secure,
        poly_eval_matrix,
    )

    assert not is_irreducible([P - 1, 0, 1])  # x^2 - 1 = (x-1)(x+1)
    assert is_irreducible([(P - W) % P, 0, 1])  # x^2 - W defines GF(p^2)

    M = ps.mds_matrix()
    f = charpoly(M)
    assert len(f) == 13 and f[-1] == 1
    Z = poly_eval_matrix(f, M)
    assert all(v == 0 for row in Z for v in row)  # Cayley–Hamilton
    assert linear_layer_secure(M)


def test_mds_entries_small_and_deterministic():
    m = ps.mds_matrix()
    assert all(1 <= v <= 127 for row in m for v in row)
    assert m == ps._small_mds_candidate(ps.MDS_CANDIDATE)


def test_mds_is_invertible():
    # full-matrix determinant nonzero (quick sanity; the exhaustive minor
    # check above is the real MDS proof)
    m = [row[:] for row in ps.mds_matrix()]
    n = len(m)
    det = 1
    for col in range(n):
        piv = next(r for r in range(col, n) if m[r][col] != 0)
        if piv != col:
            m[col], m[piv] = m[piv], m[col]
            det = -det % P
        det = det * m[col][col] % P
        inv = pow(m[col][col], P - 2, P)
        for r in range(col + 1, n):
            f = m[r][col] * inv % P
            m[r] = [(a - f * b) % P for a, b in zip(m[r], m[col])]
    assert det != 0


@pytest.mark.slow  # pallas interpret mode executes the kernel op-by-op
def test_pallas_permute_matches_oracle():
    """The Pallas TPU kernel (ops/poseidon_pallas.py) computes the same
    permutation as the host oracle, checked in interpret mode on CPU."""
    from tendermintx_tpu.ops.poseidon_pallas import BLOCK, permute_lanes

    states = rand_states(BLOCK)
    x = GF.from_ints(np.array(states, dtype=object).T)  # (12, B)
    out = permute_lanes(x, interpret=True)
    got = out.to_ints().T.tolist()
    want = [ps.permute_ints(s) for s in states[:16]]
    assert got[:16] == want
