"""Step/skip verification programs: fixture-driven end-to-end + negatives.

Mirrors the reference's integration test shape (step.rs:231-268,
skip.rs:252-296): sizes 2/4 validators on recorded mocha-4 fixtures, plus
synthetic-chain cases the reference cannot test (round != 0).
"""

import os

import pytest

from tendermintx_tpu.circuits.config import MOCHA_4, TendermintConfig
from tendermintx_tpu.circuits.skip import SkipCircuit, decode_skip_input, encode_skip_input
from tendermintx_tpu.circuits.step import StepCircuit, decode_step_input, encode_step_input
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.testchain import TestChain

REF_FIXTURES = "/root/reference/circuits/fixtures/mocha-4"
ref = pytest.mark.skipif(
    not os.path.isdir(REF_FIXTURES), reason="reference fixtures not present"
)


def ref_fetcher():
    return InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)


def test_io_packing_roundtrip():
    h = bytes(range(32))
    assert decode_step_input(encode_step_input(123456789, h)) == (123456789, h)
    enc = encode_skip_input(10000, h, 10500)
    assert len(enc) == 48
    assert decode_skip_input(enc) == (10000, h, 10500)
    # abi.encodePacked layout: uint64 big-endian then raw bytes32
    assert enc[:8] == (10000).to_bytes(8, "big")
    assert enc[8:40] == h


@ref
def test_step_small():
    f = ref_fetcher()
    prev = f.get_signed_header_from_number(10000)
    circuit = StepCircuit(max_validators=4, config=MOCHA_4, fetcher=f)
    out = circuit.run(encode_step_input(10000, prev.header.hash()))
    nxt = f.get_signed_header_from_number(10001)
    assert out == nxt.header.hash()


@ref
def test_step_wrong_prev_hash_fails():
    f = ref_fetcher()
    circuit = StepCircuit(max_validators=4, config=MOCHA_4, fetcher=f)
    with pytest.raises(AssertionError):
        circuit.run(encode_step_input(10000, bytes(32)))


@ref
def test_step_wrong_chain_id_fails():
    f = ref_fetcher()
    prev = f.get_signed_header_from_number(10000)
    bad_cfg = TendermintConfig(chain_id="celestia")  # fixtures are mocha-4
    circuit = StepCircuit(max_validators=4, config=bad_cfg, fetcher=f)
    with pytest.raises(ValueError, match="step verification failed"):
        circuit.run(encode_step_input(10000, prev.header.hash()))


@ref
def test_skip_small():
    f = ref_fetcher()
    trusted = f.get_signed_header_from_number(10000)
    circuit = SkipCircuit(max_validators=4, config=MOCHA_4, fetcher=f)
    out = circuit.run(encode_skip_input(10000, trusted.header.hash(), 10500))
    target = f.get_signed_header_from_number(10500)
    assert out == target.header.hash()


@ref
def test_skip_distance_too_small_fails():
    f = ref_fetcher()
    trusted = f.get_signed_header_from_number(10000)
    circuit = SkipCircuit(max_validators=4, config=MOCHA_4, fetcher=f)
    # target == trusted + 1 violates trusted + 1 < target
    with pytest.raises(Exception):
        circuit.run(encode_skip_input(10000, trusted.header.hash(), 10001))


def test_step_synthetic_nonzero_round(tmp_path):
    chain = TestChain(n_validators=4, chain_id="test-chain")
    chain.extend(round=2)
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    cfg = TendermintConfig(chain_id="test-chain")
    circuit = StepCircuit(max_validators=8, config=cfg, fetcher=f)
    out = circuit.run(encode_step_input(1, chain.headers[1].hash()))
    assert out == chain.headers[2].hash()


def test_skip_synthetic_with_absent(tmp_path):
    chain = TestChain(n_validators=8, powers=[10] * 8, chain_id="test-chain")
    for _ in range(4):
        chain.extend(signers=[0, 1, 2, 3, 4, 5])  # 6/8 = 75% > 2/3
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    cfg = TendermintConfig(chain_id="test-chain")
    circuit = SkipCircuit(max_validators=8, config=cfg, fetcher=f)
    out = circuit.run(encode_skip_input(1, chain.headers[1].hash(), 5))
    assert out == chain.headers[5].hash()


@pytest.mark.slow
def test_step_scale_32(tmp_path):
    """Reference tests N=32 (step.rs:234-268); full witness circuit."""
    chain = TestChain(n_validators=32, chain_id="scale-32")
    for _ in range(3):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    cfg = TendermintConfig(chain_id="scale-32")
    circuit = StepCircuit(max_validators=32, config=cfg, fetcher=f)
    out = circuit.run(encode_step_input(2, chain.headers[2].hash()))
    assert out == chain.headers[3].hash()


@pytest.mark.slow
def test_skip_scale_100(tmp_path):
    """Reference's Celestia-size test (skip.rs:287 at N=100)."""
    chain = TestChain(n_validators=100, chain_id="scale-100")
    for _ in range(5):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    cfg = TendermintConfig(chain_id="scale-100")
    circuit = SkipCircuit(max_validators=100, config=cfg, fetcher=f)
    out = circuit.run(encode_skip_input(1, chain.headers[1].hash(), 5))
    assert out == chain.headers[5].hash()


@pytest.mark.skipif(
    not os.environ.get("TMX_BIG"), reason="set TMX_BIG=1 for the 128-lane composite"
)
@pytest.mark.slow
def test_skip_scale_128_composite(tmp_path):
    """The BASELINE.md north-star statement size: full composite proof for
    a 128-validator skip, verified standalone."""
    from tendermintx_tpu.circuits.composite import (
        prove_skip_composite,
        verify_skip_composite,
    )

    chain = TestChain(n_validators=128, chain_id="scale-128")
    for _ in range(5):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    trusted = chain.headers[1].hash()
    inputs = f.get_skip_inputs(1, trusted, 5, max_validators=128)
    proof = prove_skip_composite(1, trusted, 5, inputs)
    out = verify_skip_composite(proof, "scale-128", 100_800)
    assert out == (1, trusted, 5, chain.headers[5].hash())


def test_skip_synthetic_insufficient_power_fails(tmp_path):
    chain = TestChain(n_validators=8, powers=[10] * 8, chain_id="test-chain")
    for _ in range(4):
        chain.extend(signers=[0, 1, 2, 4])  # 50% < 2/3
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    cfg = TendermintConfig(chain_id="test-chain")
    circuit = SkipCircuit(max_validators=8, config=cfg, fetcher=f)
    with pytest.raises(ValueError, match="skip verification failed"):
        circuit.run(encode_skip_input(1, chain.headers[1].hash(), 5))
