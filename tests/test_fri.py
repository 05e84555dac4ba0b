"""FRI prove/verify round trip, tamper rejection, and high-degree rejection."""

import numpy as np
import pytest

from tendermintx_tpu.ops import ntt
from tendermintx_tpu.ops.ext import GF2
from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark import fri
from tendermintx_tpu.stark.challenger import Challenger

rng = np.random.default_rng(5)

CFG = fri.FriConfig(rate_bits=2, n_queries=8, final_poly_len=8)


def make_lde(log_deg, rate_bits, seed=0):
    r = np.random.default_rng(seed)
    n = 1 << log_deg
    coeffs0 = [int(r.integers(0, 2**63)) % P for _ in range(n)]
    coeffs1 = [int(r.integers(0, 2**63)) % P for _ in range(n)]
    c0 = ntt.coset_lde(GF.from_ints(np.array([coeffs0], dtype=object)), rate_bits)[0]
    c1 = ntt.coset_lde(GF.from_ints(np.array([coeffs1], dtype=object)), rate_bits)[0]
    return GF2(c0, c1)


def test_fri_roundtrip():
    evals = make_lde(6, CFG.rate_bits)  # degree < 64, domain 256
    proof = fri.fri_prove(evals, Challenger(), CFG)
    assert fri.fri_verify(proof, 64, 256, Challenger(), CFG)


def test_fri_layer0_check_hook():
    evals = make_lde(6, CFG.rate_bits)
    c0, c1 = evals.to_ints()
    host = list(zip(c0.tolist(), c1.tolist()))
    proof = fri.fri_prove(evals, Challenger(), CFG)
    seen = []

    def check(idx, val):
        seen.append(idx)
        return tuple(val) == host[idx]

    assert fri.fri_verify(proof, 64, 256, Challenger(), CFG, layer0_check=check)
    assert len(seen) == CFG.n_queries

    def bad_check(idx, val):
        return False

    assert not fri.fri_verify(proof, 64, 256, Challenger(), CFG, layer0_check=bad_check)


def test_fri_tamper_rejected():
    evals = make_lde(6, CFG.rate_bits)
    proof = fri.fri_prove(evals, Challenger(), CFG)
    # tamper a final poly coefficient
    import copy

    p2 = copy.deepcopy(proof)
    p2.final_poly[0] = ((p2.final_poly[0][0] + 1) % P, p2.final_poly[0][1])
    assert not fri.fri_verify(p2, 64, 256, Challenger(), CFG)
    # tamper an opened query value
    p3 = copy.deepcopy(proof)
    (vi, vj, pi, pj) = p3.query_rounds[0][0]
    p3.query_rounds[0][0] = (((vi[0] + 1) % P, vi[1]), vj, pi, pj)
    assert not fri.fri_verify(p3, 64, 256, Challenger(), CFG)
    # wrong degree bound claim
    assert not fri.fri_verify(proof, 32, 256, Challenger(), CFG)


def test_fri_high_degree_fails():
    # random evals (not low-degree): the prover's own final-poly trim assert
    # must fire
    n = 256
    vals0 = [int(rng.integers(0, 2**63)) % P for _ in range(n)]
    vals1 = [int(rng.integers(0, 2**63)) % P for _ in range(n)]
    evals = GF2(
        GF.from_ints(np.array(vals0, dtype=object)),
        GF.from_ints(np.array(vals1, dtype=object)),
    )
    with pytest.raises(AssertionError):
        fri.fri_prove(evals, Challenger(), CFG)


def test_grinding_enforced():
    # a proof with a wrong pow nonce must fail before any query checking
    evals = make_lde(6, CFG.rate_bits)
    cfg = fri.FriConfig(rate_bits=2, n_queries=8, final_poly_len=8, proof_of_work_bits=8)
    proof = fri.fri_prove(evals, Challenger(), cfg)
    assert fri.fri_verify(proof, 64, 256, Challenger(), cfg)
    import copy

    bad = copy.deepcopy(proof)
    bad.pow_nonce += 1
    assert not fri.fri_verify(bad, 64, 256, Challenger(), cfg)
    # stricter verifier: proof ground for 8 bits fails a 20-bit check
    cfg20 = fri.FriConfig(rate_bits=2, n_queries=8, final_poly_len=8, proof_of_work_bits=20)
    assert not fri.fri_verify(proof, 64, 256, Challenger(), cfg20)
