"""Validator-leaf STARK bundle: prove/verify/serialize through the circuits."""

import hashlib
import json

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.circuits.config import TendermintConfig
from tendermintx_tpu.circuits.proving import (
    LeafProofBundle,
    prove_validator_leaves,
    verify_leaf_bundle,
)
from tendermintx_tpu.circuits.step import StepCircuit, encode_step_input
from tendermintx_tpu.inputs.conversion import get_validator_data_from_block
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.testchain import TestChain
from tendermintx_tpu.stark.prover import StarkConfig

CFG = StarkConfig(rate_bits=2, n_queries=8, final_poly_len=8)


@pytest.fixture(scope="module")
def chain_and_lanes():
    chain = TestChain(n_validators=3)
    h = chain.extend()
    lanes = get_validator_data_from_block(
        chain.val_set, chain.commits[h], chain.chain_id, 4
    )
    return chain, lanes


def test_leaf_bundle_roundtrip(chain_and_lanes):
    chain, lanes = chain_and_lanes
    bundle = prove_validator_leaves(lanes, CFG)
    assert verify_leaf_bundle(bundle, lanes, CFG)
    # proven digests match direct hashing of the leaves
    from tendermintx_tpu.circuits.proving import _leaf_bytes

    for lane, digest in zip(lanes, bundle.digests()):
        assert digest == hashlib.sha256(_leaf_bytes(lane)).digest()


def test_leaf_bundle_serialization(chain_and_lanes):
    chain, lanes = chain_and_lanes
    bundle = prove_validator_leaves(lanes, CFG)
    blob = json.dumps(bundle.to_dict())
    restored = LeafProofBundle.from_dict(json.loads(blob))
    assert verify_leaf_bundle(restored, lanes, CFG)


def test_leaf_bundle_wrong_lanes_rejected(chain_and_lanes):
    chain, lanes = chain_and_lanes
    bundle = prove_validator_leaves(lanes, CFG)
    other = TestChain(n_validators=3, seed=b"other")
    h = other.extend()
    other_lanes = get_validator_data_from_block(
        other.val_set, other.commits[h], other.chain_id, 4
    )
    assert not verify_leaf_bundle(bundle, other_lanes, CFG)


def test_step_run_with_proof(tmp_path):
    chain = TestChain(n_validators=3, chain_id="test-chain")
    for _ in range(2):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    circuit = StepCircuit(4, TendermintConfig(chain_id="test-chain"), f)
    out, bundle = circuit.run_with_proof(
        encode_step_input(1, chain.headers[1].hash()), CFG
    )
    assert out == chain.headers[2].hash()
    inputs = f.get_step_inputs(1, chain.headers[1].hash(), 4)
    assert verify_leaf_bundle(bundle, inputs.next_block_validators, CFG)


def test_leaf_bundle_32_lanes_real_validators():
    """BASELINE config 2 shape: a 32-lane circuit batch over real mocha-4
    validators (n=2048 trace rows)."""
    import os

    fix = "/root/reference/circuits/fixtures/mocha-4"
    if not os.path.isdir(fix):
        pytest.skip("reference fixtures not present")
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    vals = f.get_validator_set_from_number(10500)
    s = f.get_signed_header_from_number(10500)
    lanes = get_validator_data_from_block(vals, s.commit, "mocha-4", 32)
    cfg = StarkConfig(rate_bits=2, n_queries=28, final_poly_len=8)
    bundle = prove_validator_leaves(lanes, cfg)
    assert verify_leaf_bundle(bundle, lanes, cfg)
    assert len(bundle.digests()) == 32
