"""Recursion-wrapped composite proofs end to end (slow tier).

The wrapped composite is the TPU-native analog of the reference's
recursion-wrapped deliverable (/root/reference/circuits/step.rs:223 →
contracts/src/TendermintX.sol:111-114): ONE proof whose wire size is
independent of the validator count, verified without openings.

Uses a reduced-security config to keep the CPU runtime sane; the
full-security path is exercised by bench.py on the TPU.
"""

import copy
import json
import tempfile

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.circuits.composite import (
    CompositeProof,
    prove_skip_composite,
    verify_skip_composite,
    wrap_composite,
)
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.testchain import TestChain
from tendermintx_tpu.stark.prover import StarkConfig

CHAIN_ID = "test-chain-wrap"
SKIP_MAX = 100
CFG = StarkConfig(
    rate_bits=3, n_queries=6, final_poly_len=64, proof_of_work_bits=4
)
WRAP_CFG = StarkConfig(
    rate_bits=3, n_queries=6, final_poly_len=32, proof_of_work_bits=2
)
# reduced-security test floor: both the base and the wrap config must
# clear it (the wrapped verify enforces the floor on BOTH)
MIN_BITS = min(CFG.fri.security_bits, WRAP_CFG.fri.security_bits)


@pytest.fixture(scope="module")
def wrapped_proof():
    chain = TestChain(n_validators=4, chain_id=CHAIN_ID)
    for _ in range(6):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="wrapped_fixtures_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
    trusted = chain.headers[1].hash()
    target = chain.headers[5].hash()
    inputs = f.get_skip_inputs(1, trusted, 5, max_validators=8)
    base = prove_skip_composite(1, trusted, 5, inputs, config=CFG)
    wrapped = wrap_composite(base, config=CFG, wrap_config=WRAP_CFG)
    return base, wrapped, trusted, target


def test_wrapped_composite_verifies(wrapped_proof):
    base, wrapped, trusted, target = wrapped_proof
    assert wrapped.is_wrapped and not base.is_wrapped
    out = verify_skip_composite(
        wrapped, CHAIN_ID, SKIP_MAX, config=CFG,
        min_security_bits=MIN_BITS, wrap_config=WRAP_CFG,
    )
    assert out == (1, trusted, 5, target)


def test_wrapped_composite_wire_roundtrip_and_size(wrapped_proof):
    base, wrapped, trusted, target = wrapped_proof
    blob = json.dumps(wrapped.to_dict())
    base_blob = json.dumps(base.to_dict())
    # the whole point: openings + FRI query rounds leave the wire. At this
    # reduced 6-query config the shared OOD header dominates both objects,
    # so the ratio is modest here; at the production 28-query config the
    # openings are >1.3 MB of a 1.76 MB proof (BENCH_r03) and the wrapped
    # size is ~5x smaller (measured by bench.py on the TPU).
    assert len(blob) < len(base_blob), (len(blob), len(base_blob))
    d = json.loads(blob)
    assert d["batch"]["wrapped"] is True
    assert all(not s["openings"] for s in d["batch"]["statements"])
    assert "query_rounds" not in d["batch"]
    proof2 = CompositeProof.from_dict(json.loads(blob))
    assert proof2.is_wrapped
    out = verify_skip_composite(
        proof2, CHAIN_ID, SKIP_MAX, config=CFG,
        min_security_bits=MIN_BITS, wrap_config=WRAP_CFG,
    )
    assert out == (1, trusted, 5, target)


def test_wrapped_composite_tamper_rejected(wrapped_proof):
    _base, wrapped, _t, _tg = wrapped_proof
    args = dict(config=CFG, min_security_bits=MIN_BITS, wrap_config=WRAP_CFG)

    bad = copy.deepcopy(wrapped)
    bad.abi_output = bytes(32)
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX, **args) is None

    bad = copy.deepcopy(wrapped)
    bad.batch.statements[0].trace_cap[0][0] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX, **args) is None

    bad = copy.deepcopy(wrapped)
    bad.batch.wrapper.statements[0].public_inputs[3] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX, **args) is None

    bad = copy.deepcopy(wrapped)
    v = bad.batch.statements[1].ood_trace[0][0]
    bad.batch.statements[1].ood_trace[0][0] = ((v[0] + 1) % (2**64 - 2**32 + 1), v[1])
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX, **args) is None

    # wrong chain still rejected through the wrapped path
    assert verify_skip_composite(wrapped, "other", SKIP_MAX, **args) is None


def test_wrapped_step_composite():
    """Step-kind wrapped composite: prove, wrap, wire roundtrip, verify."""
    from tendermintx_tpu.circuits.composite import (
        prove_step_composite,
        verify_step_composite,
    )

    chain = TestChain(n_validators=4, chain_id=CHAIN_ID)
    for _ in range(5):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="wrapped_step_fixtures_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
    prev = chain.headers[3].hash()
    inputs = f.get_step_inputs(3, prev, max_validators=8)
    base = prove_step_composite(3, prev, inputs, config=CFG)
    wrapped = wrap_composite(base, config=CFG, wrap_config=WRAP_CFG)
    proof2 = CompositeProof.from_bytes(wrapped.to_bytes())
    out = verify_step_composite(
        proof2, CHAIN_ID, config=CFG,
        min_security_bits=MIN_BITS, wrap_config=WRAP_CFG,
    )
    assert out == (3, prev, inputs.next_header)
    # tamper: a wrapper cap bit flips -> reject
    bad = copy.deepcopy(proof2)
    bad.batch.wrapper.statements[0].trace_cap[0][0] ^= 1
    assert verify_step_composite(
        bad, CHAIN_ID, config=CFG,
        min_security_bits=MIN_BITS, wrap_config=WRAP_CFG,
    ) is None
