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
