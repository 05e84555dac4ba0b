"""Runtime layer: artifact round-trip, CLI build/prove, operator loop."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.testchain import TestChain
from tendermintx_tpu.runtime.operator import (
    MockContract,
    OperatorConfig,
    TendermintXOperator,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def chain_fixtures(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chainfix")
    chain = TestChain(n_validators=4, chain_id="test-chain")
    for _ in range(6):
        chain.extend()
    chain.write_fixtures(str(tmp))
    return chain, str(tmp)


def test_artifact_roundtrip(tmp_path, chain_fixtures):
    """The serialization-registry equivalent of the reference's
    circuit.test_serializers (step.rs:156-166): build -> save -> load ->
    prove must produce identical results to the live circuit."""
    import jax.numpy as jnp
    import numpy as np

    from tendermintx_tpu.circuits.variables import pack_step_witness
    from tendermintx_tpu.circuits.verify import chain_id_leaf_const
    from tendermintx_tpu.runtime.artifact import CircuitArtifact, build_artifact

    chain, fix = chain_fixtures
    artifact = build_artifact("step", "test-chain", max_validators=8)
    artifact.save(str(tmp_path / "step"))
    loaded = CircuitArtifact.load(str(tmp_path / "step"))
    assert loaded.max_validators == 8

    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    inputs = f.get_step_inputs(2, chain.headers[2].hash(), 8)
    witness = pack_step_witness(inputs)
    cid_leaf, cid_len = chain_id_leaf_const("test-chain")
    valid, out = loaded.call(
        witness,
        jnp.asarray(np.frombuffer(chain.headers[2].hash(), dtype=np.uint8)),
        jnp.uint32(2),
        jnp.uint32(0),
        cid_leaf,
        cid_len,
    )
    assert bool(valid)
    assert bytes(np.asarray(out)) == chain.headers[3].hash()
    # wrong-circuit load is rejected
    with pytest.raises(ValueError, match="artifact is for step"):
        CircuitArtifact.load(str(tmp_path / "step"), circuit="skip")


def test_cli_build_prove(tmp_path, chain_fixtures):
    chain, fix = chain_fixtures
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    build_dir = str(tmp_path / "build")
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "build",
         "--circuit", "skip", "--chain", "test-chain",
         "--max-validators", "8", "--out", build_dir],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    from tendermintx_tpu.circuits.skip import encode_skip_input

    req = {"input": "0x" + encode_skip_input(2, chain.headers[2].hash(), 6).hex()}
    input_path = str(tmp_path / "input.json")
    with open(input_path, "w") as f:
        json.dump(req, f)
    out_path = str(tmp_path / "proof.json")
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "prove",
         "--artifact", build_dir, "--input", input_path, "--out", out_path,
         "--fixture-path", fix],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    with open(out_path) as f:
        result = json.load(f)
    assert result["valid"] is True
    assert result["output"] == "0x" + chain.headers[6].hash().hex()

    # composite prove -> standalone verify (no fixture path: the verifier
    # must need nothing beyond the proof file and the chain config)
    comp_path = str(tmp_path / "composite.json")
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "prove",
         "--artifact", build_dir, "--input", input_path, "--out", comp_path,
         "--fixture-path", fix, "--composite"],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "verify",
         "--proof", comp_path],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    assert "composite proof: OK" in r.stdout
    # tampered output header must fail standalone verification
    with open(comp_path) as f:
        tampered = json.load(f)
    tampered["composite_proof"]["abi_output"] = "00" * 32
    tam_path = str(tmp_path / "tampered.json")
    with open(tam_path, "w") as f:
        json.dump(tampered, f)
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "verify",
         "--proof", tam_path],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 1


def test_operator_advances_mock_contract(chain_fixtures):
    chain, fix = chain_fixtures
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    cfg = OperatorConfig(chain_id="test-chain", max_validators=8, fixture_path=fix)
    contract = MockContract(1, chain.headers[1].hash())
    op = TendermintXOperator(cfg, contract=contract, fetcher=f)
    # chain tip is 7; the whole distance is one valid skip
    result = op.tick(chain_tip=7)
    assert result == ("skip", 7)
    assert contract.latest_block() == 7
    assert contract.header_hash(7) == chain.headers[7].hash()
    # second tick: nothing to do
    assert op.tick(chain_tip=7) is None


def test_operator_consistency_check(chain_fixtures):
    chain, fix = chain_fixtures
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    cfg = OperatorConfig(chain_id="test-chain", max_validators=8, fixture_path=fix)
    contract = MockContract(1, b"\xde\xad" * 16)  # wrong genesis header
    op = TendermintXOperator(cfg, contract=contract, fetcher=f)
    with pytest.raises(RuntimeError, match="does not match"):
        op.tick(chain_tip=7)


def test_operator_steps_when_adjacent(chain_fixtures):
    chain, fix = chain_fixtures
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    cfg = OperatorConfig(chain_id="test-chain", max_validators=8, fixture_path=fix)
    contract = MockContract(6, chain.headers[6].hash())
    op = TendermintXOperator(cfg, contract=contract, fetcher=f)
    result = op.tick(chain_tip=7)
    assert result == ("step", 7)
    assert contract.header_hash(7) == chain.headers[7].hash()


def test_operator_with_stark_bundle(chain_fixtures):
    from tendermintx_tpu.circuits.proving import verify_leaf_bundle

    chain, fix = chain_fixtures
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    cfg = OperatorConfig(
        chain_id="test-chain", max_validators=4, fixture_path=fix, prove_stark=True
    )
    contract = MockContract(6, chain.headers[6].hash())
    op = TendermintXOperator(cfg, contract=contract, fetcher=f)
    result = op.tick(chain_tip=7)
    assert result == ("step", 7)
    assert op.last_bundle is not None
    inputs = f.get_step_inputs(6, chain.headers[6].hash(), 4)
    assert verify_leaf_bundle(op.last_bundle, inputs.next_block_validators)


def test_cli_prove_wrap_verify(tmp_path, chain_fixtures):
    """CLI `prove --composite --wrap` -> `verify` round-trip (VERDICT r4
    next-step #5): the proof file carries a recursion-WRAPPED composite and
    cmd_verify accepts it (and rejects a tampered copy). Reduced-security
    config via the runtime env knobs, passed to both subprocesses."""
    chain, fix = chain_fixtures
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
        TMX_FRI_CONFIG="3,6,64,4",
        TMX_WRAP_FRI_CONFIG="3,6,32,2",
        TMX_MIN_SECURITY_BITS="20",
    )
    build_dir = str(tmp_path / "build")
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "build",
         "--circuit", "skip", "--chain", "test-chain",
         "--max-validators", "8", "--out", build_dir],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    from tendermintx_tpu.circuits.skip import encode_skip_input

    req = {"input": "0x" + encode_skip_input(2, chain.headers[2].hash(), 6).hex()}
    input_path = str(tmp_path / "input.json")
    with open(input_path, "w") as f:
        json.dump(req, f)
    out_path = str(tmp_path / "wrapped.json")
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "prove",
         "--artifact", build_dir, "--input", input_path, "--out", out_path,
         "--fixture-path", fix, "--composite", "--wrap"],
        capture_output=True, text=True, env=env, timeout=2400,
    )
    assert r.returncode == 0, r.stderr
    assert "recursion-wrapped" in r.stdout
    with open(out_path) as f:
        result = json.load(f)
    assert result["valid"] is True
    assert result["composite_proof"]["batch"]["wrapped"] is True

    # standalone verify: needs only the proof file + chain config
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "verify",
         "--proof", out_path],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    assert "composite proof: OK" in r.stdout

    # tampered wrapped proof file -> clean FAILED, rc 1
    result["composite_proof"]["abi_output"] = "00" * 32
    tam_path = str(tmp_path / "wrapped_tampered.json")
    with open(tam_path, "w") as f:
        json.dump(result, f)
    r = subprocess.run(
        [sys.executable, "-m", "tendermintx_tpu.runtime.cli", "verify",
         "--proof", tam_path],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 1
