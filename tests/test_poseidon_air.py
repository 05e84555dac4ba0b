"""Poseidon hash-chain AIR: end-to-end STARK prove + verify."""

import copy

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.ops.goldilocks import P
from tendermintx_tpu.stark.poseidon_air import (
    PoseidonChainAir,
    poseidon_chain_output,
    poseidon_chain_trace,
)
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.verifier import verify

CFG = StarkConfig(rate_bits=3, n_queries=8, final_poly_len=8)
INPUT = [7 * i + 3 for i in range(12)]


def test_trace_matches_permute_oracle():
    _, publics = poseidon_chain_trace(INPUT, 4)
    assert publics[12:] == poseidon_chain_output(INPUT, 4)


def test_poseidon_chain_stark_roundtrip():
    trace, publics = poseidon_chain_trace(INPUT, 4)  # n = 128 rows
    air = PoseidonChainAir()
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)


def test_wrong_output_rejected():
    trace, publics = poseidon_chain_trace(INPUT, 4)
    air = PoseidonChainAir()
    bad_publics = list(publics)
    bad_publics[12] = (bad_publics[12] + 1) % P
    proof = prove(air, trace, bad_publics, CFG)
    assert not verify(air, proof, CFG)


def test_tampered_proof_rejected():
    trace, publics = poseidon_chain_trace(INPUT, 4)
    air = PoseidonChainAir()
    proof = prove(air, trace, publics, CFG)
    bad = copy.deepcopy(proof)
    bad.ood_quotient[0] = ((bad.ood_quotient[0][0] + 1) % P, bad.ood_quotient[0][1])
    assert not verify(air, bad, CFG)
