"""End-to-end STARK: Fibonacci AIR prove + verify, tamper rejection."""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark.air import Air
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.verifier import verify


class FibonacciAir(Air):
    """Two columns (a, b); step: (a, b) -> (b, a + b).

    public inputs: [a0, b0, b_final]
    """

    n_cols = 2
    n_public = 3
    constraint_degree = 3  # actual degree is 1, but exercise chunk splitting

    def eval_transition(self, frame, alg):
        a, b = frame.local
        a_n, b_n = frame.next
        return [a_n - b, b_n - (a + b)]

    def eval_first(self, frame, alg):
        a, b = frame.local
        return [a - frame.public[0], b - frame.public[1]]

    def eval_last(self, frame, alg):
        _, b = frame.local
        return [b - frame.public[2]]


def fib_trace(n_rows, a0=1, b0=1):
    rows = [[a0, b0]]
    for _ in range(n_rows - 1):
        a, b = rows[-1]
        rows.append([b, (a + b) % P])
    cols = np.array(rows, dtype=object).T  # (2, n_rows)
    return GF.from_ints(cols), rows[-1][1]


CFG = StarkConfig(rate_bits=3, n_queries=8, final_poly_len=8)


def test_fibonacci_stark_roundtrip():
    trace, b_final = fib_trace(64)
    air = FibonacciAir()
    proof = prove(air, trace, [1, 1, b_final], CFG)
    assert verify(air, proof, CFG)


def test_wrong_public_input_rejected():
    trace, b_final = fib_trace(64)
    air = FibonacciAir()
    proof = prove(air, trace, [1, 1, b_final], CFG)
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % P
    assert not verify(air, bad, CFG)


def test_tampered_trace_rejected():
    # honest trace but lie about the final value in publics at prove time:
    # the OOD composition identity must fail at verification
    trace, b_final = fib_trace(64)
    air = FibonacciAir()
    proof = prove(air, trace, [1, 1, (b_final + 1) % P], CFG)
    assert not verify(air, proof, CFG)


def test_tampered_ood_rejected():
    trace, b_final = fib_trace(64)
    air = FibonacciAir()
    proof = prove(air, trace, [1, 1, b_final], CFG)
    bad = copy.deepcopy(proof)
    bad.ood_trace[0][0] = ((bad.ood_trace[0][0][0] + 1) % P, bad.ood_trace[0][0][1])
    assert not verify(air, bad, CFG)


def test_larger_trace():
    trace, b_final = fib_trace(256)
    air = FibonacciAir()
    proof = prove(air, trace, [1, 1, b_final], CFG)
    assert verify(air, proof, CFG)


def test_blocked_prover_paths_byte_identical(monkeypatch):
    """The HBM-streaming block paths (quotient frames + DEEP composition,
    round 5: the B=128 Ed25519 statement's full-domain programs wanted
    11-26 GB) must produce byte-identical proofs to the one-shot
    programs."""
    import json

    from tendermintx_tpu.stark import prover as pr
    from tendermintx_tpu.stark.serialize import stark_proof_to_dict

    trace, b_final = fib_trace(64)
    air = FibonacciAir()
    p1 = prove(air, trace, [1, 1, b_final], CFG)
    blob1 = json.dumps(stark_proof_to_dict(p1))
    monkeypatch.setattr(pr, "_QUOTIENT_BLOCK_ELEMS", 64)
    monkeypatch.setattr(pr, "_DEEP_BLOCK_ELEMS", 64)
    saved = dict(pr._FN_CACHE)
    pr._FN_CACHE.clear()
    try:
        p2 = prove(air, trace, [1, 1, b_final], CFG)
    finally:
        pr._FN_CACHE.clear()
        pr._FN_CACHE.update(saved)
    assert json.dumps(stark_proof_to_dict(p2)) == blob1
    assert verify(air, p2, CFG)
