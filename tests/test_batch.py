"""Batch STARK: several statements, one shared FRI (stark/batch.py)."""

import copy

import numpy as np
import pytest

from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark.air import Air
from tendermintx_tpu.stark.batch import prove_batch, verify_batch
from tendermintx_tpu.stark.prover import StarkConfig

from test_stark import FibonacciAir, fib_trace


class MixAir(Air):
    """8 columns; next[i] = local[i]*local[(i+1)%8] + local[(i+2)%8]."""

    n_cols = 8
    n_public = 8
    constraint_degree = 2

    def eval_transition(self, frame, alg):
        loc, nxt = frame.local, frame.next
        return [
            nxt[i] - (loc[i] * loc[(i + 1) % 8] + loc[(i + 2) % 8])
            for i in range(8)
        ]

    def eval_first(self, frame, alg):
        return [frame.local[i] - frame.public[i] for i in range(8)]


def mix_trace(n_rows):
    rows = [[(i * 5 + 1) % P for i in range(8)]]
    for _ in range(n_rows - 1):
        r = rows[-1]
        rows.append(
            [(r[i] * r[(i + 1) % 8] + r[(i + 2) % 8]) % P for i in range(8)]
        )
    cols = np.array(rows, dtype=object).T
    return GF.from_ints(cols), list(rows[0])


CFG = StarkConfig(rate_bits=3, n_queries=8, final_poly_len=8)


def _make_batch():
    fib_tr, b_final = fib_trace(64)
    mix_tr, mix_pub = mix_trace(256)
    airs = [FibonacciAir(), MixAir()]
    traces = [fib_tr, mix_tr]
    publics = [[1, 1, b_final], mix_pub]
    return airs, traces, publics


@pytest.fixture(scope="module")
def batch_airs():
    return _make_batch()[0]


@pytest.fixture(scope="module")
def batch_proof(batch_airs):
    """ONE proved batch shared by the whole tamper suite (proving per test
    kept this file out of the fast tier, VERDICT r3 next-step #9)."""
    airs, traces, publics = _make_batch()
    return prove_batch(airs, traces, publics, CFG)


def test_batch_roundtrip_mixed_sizes():
    airs, traces, publics = _make_batch()
    proof = prove_batch(airs, traces, publics, CFG, transcript_seed=[7, 9])
    assert verify_batch(airs, proof, CFG, transcript_seed=[7, 9])
    # one shared FRI: a single layer family sized by the LARGER statement
    assert len(proof.fri_proof.layer_caps) > 0
    # smaller statement's openings live on its own (smaller) domain
    n_small = 64 << CFG.rate_bits
    assert all(q < n_small for q in proof.statements[0].openings)


def test_batch_same_sizes():
    fib_tr, b_final = fib_trace(256)
    mix_tr, mix_pub = mix_trace(256)
    airs = [FibonacciAir(), MixAir()]
    proof = prove_batch(
        airs, [fib_tr, mix_tr], [[1, 1, b_final], mix_pub], CFG
    )
    assert verify_batch(airs, proof, CFG)


def test_batch_wrong_seed_rejected(batch_airs, batch_proof):
    assert not verify_batch(batch_airs, batch_proof, CFG, transcript_seed=[7, 8])


def test_batch_tampered_public_rejected(batch_airs, batch_proof):
    airs, proof = batch_airs, batch_proof
    bad = copy.deepcopy(proof)
    bad.statements[1].public_inputs[0] ^= 1
    assert not verify_batch(airs, bad, CFG)


def test_batch_tampered_ood_rejected(batch_airs, batch_proof):
    airs, proof = batch_airs, batch_proof
    bad = copy.deepcopy(proof)
    v0 = bad.statements[0].ood_trace[0][0]
    bad.statements[0].ood_trace[0][0] = ((v0[0] + 1) % P, v0[1])
    assert not verify_batch(airs, bad, CFG)


def test_batch_tampered_opening_rejected(batch_airs, batch_proof):
    airs, proof = batch_airs, batch_proof
    bad = copy.deepcopy(proof)
    idx = next(iter(bad.statements[1].openings))
    row = list(bad.statements[1].openings[idx][0])
    row[0] = (row[0] + 1) % P
    op = list(bad.statements[1].openings[idx])
    op[0] = row
    bad.statements[1].openings[idx] = tuple(op)
    assert not verify_batch(airs, bad, CFG)


def test_batch_swapped_statements_rejected(batch_airs, batch_proof):
    airs, proof = batch_airs, batch_proof
    bad = copy.deepcopy(proof)
    bad.statements = bad.statements[::-1]
    assert not verify_batch(airs, bad, CFG)


def test_batch_cross_statement_fri_binding(batch_proof):
    """A valid proof for statements (A, B) must not verify as a batch
    containing only A (the shared FRI binds every codeword)."""
    airs, proof = _make_batch()[0], None
    proof = batch_proof
    solo = copy.deepcopy(proof)
    solo.statements = [solo.statements[1]]
    assert not verify_batch([airs[1]], solo, CFG)
