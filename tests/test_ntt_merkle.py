"""NTT/LDE and Merkle tree tests."""

import jax
import numpy as np

from tendermintx_tpu.ops import merkle, ntt
from tendermintx_tpu.ops.goldilocks import GF, P, MULTIPLICATIVE_GENERATOR

rng = np.random.default_rng(99)


def rand_poly(n):
    return [int(rng.integers(0, 2**63)) % P for _ in range(n)]


def test_ntt_matches_oracle():
    for n in (1, 2, 8, 64, 256):
        coeffs = rand_poly(n)
        x = GF.from_ints(np.array([coeffs], dtype=object))
        got = jax.jit(ntt.ntt)(x).to_ints()[0].tolist()
        assert got == ntt.ntt_ints(coeffs), f"n={n}"


def test_intt_roundtrip():
    coeffs = rand_poly(128)
    x = GF.from_ints(np.array([coeffs, list(reversed(coeffs))], dtype=object))
    back = jax.jit(lambda x: ntt.intt(ntt.ntt(x)))(x)
    assert back.to_ints().tolist() == x.to_ints().tolist()


def test_ntt_batch_axes():
    polys = [rand_poly(32) for _ in range(6)]
    x = GF.from_ints(np.array(polys, dtype=object).reshape(2, 3, 32))
    got = jax.jit(ntt.ntt)(x).to_ints().reshape(6, 32)
    for i, p in enumerate(polys):
        assert got[i].tolist() == ntt.ntt_ints(p)


def test_coset_lde_evaluates_on_coset():
    n, rate_bits = 16, 2
    coeffs = rand_poly(n)
    x = GF.from_ints(np.array([coeffs], dtype=object))
    evals = jax.jit(lambda x: ntt.coset_lde(x, rate_bits))(x).to_ints()[0].tolist()
    N = n << rate_bits
    w = ntt.primitive_root_of_unity(N.bit_length() - 1)
    g = MULTIPLICATIVE_GENERATOR
    for i in [0, 1, 5, N - 1]:
        pt = g * pow(w, i, P) % P
        assert evals[i] == ntt.eval_poly_ints(coeffs, pt)


def test_merkle_build_open_verify():
    rows = [[int(rng.integers(0, 2**63)) % P for _ in range(7)] for _ in range(32)]
    tree = merkle.MerkleTree.build(GF.from_ints(np.array(rows, dtype=object)))
    root = tree.root
    for idx in (0, 1, 17, 31):
        path = tree.open(idx)
        assert merkle.verify_opening([root], idx, rows[idx], path)
        # tampered leaf fails
        bad = list(rows[idx])
        bad[0] = (bad[0] + 1) % P
        assert not merkle.verify_opening([root], idx, bad, path)
        # wrong index fails
        assert not merkle.verify_opening([root], idx ^ 1, rows[idx], path)
