"""One proof object for the whole step/skip statement (circuits/composite.py).

The reference's deliverable is a single proof consumed via
`ISuccinctGateway.verifiedCall` (/root/reference/contracts/src/
TendermintX.sol:111-114). These slow tests prove a full synthetic-chain
skip and step — hash STARK + Ed25519 STARK, Fiat-Shamir-chained — and check
the composite verifier accepts exactly the true statement and rejects
tampering anywhere: the ABI IO, the signer set, the messages, the proofs.
"""

import copy
import tempfile

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.circuits.composite import (
    CompositeProof,
    parse_simple_validator,
    prove_skip_composite,
    prove_step_composite,
    verify_skip_composite,
    verify_step_composite,
)
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.testchain import TestChain

CHAIN_ID = "composite-chain"
SKIP_MAX = 100


def _fetcher(n_validators=4, blocks=6):
    chain = TestChain(n_validators=n_validators, chain_id=CHAIN_ID)
    for _ in range(blocks):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="composite_fixtures_")
    chain.write_fixtures(tmp)
    return chain, InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)


def test_parse_simple_validator_strict():
    enc = b"\x0a\x22\x0a\x20" + bytes(32) + b"\x10\x2a"
    assert parse_simple_validator(enc) == (bytes(32), 42)
    # multi-byte varint
    enc2 = b"\x0a\x22\x0a\x20" + bytes(32) + b"\x10\xac\x02"
    assert parse_simple_validator(enc2) == (bytes(32), 300)
    # non-canonical varint (trailing zero septet)
    assert parse_simple_validator(b"\x0a\x22\x0a\x20" + bytes(32) + b"\x10\xac\x00") is None
    # truncated / wrong prefix / trailing bytes
    assert parse_simple_validator(enc[:-1] ) is None
    assert parse_simple_validator(b"\x0b" + enc[1:]) is None
    assert parse_simple_validator(enc + b"\x00") is None


def test_skip_composite_end_to_end():
    chain, f = _fetcher()
    trusted = chain.headers[1].hash()
    target = chain.headers[5].hash()
    inputs = f.get_skip_inputs(1, trusted, 5, max_validators=8)
    proof = prove_skip_composite(1, trusted, 5, inputs)

    # serialization round-trip, then verify from the proof object alone
    proof2 = CompositeProof.from_dict(proof.to_dict())
    out = verify_skip_composite(proof2, CHAIN_ID, SKIP_MAX)
    assert out == (1, trusted, 5, target)

    # statement tampering
    assert verify_skip_composite(proof2, "other-chain", SKIP_MAX) is None
    assert verify_skip_composite(proof2, CHAIN_ID, 3) is None  # skip too far

    bad = copy.deepcopy(proof2)
    bad.abi_output = bytes(32)
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # drop a signer: 4 equal-power validators -> 3/4 still >2/3, drop two -> fail
    bad = copy.deepcopy(proof2)
    bad.signers = bad.signers[:2]
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # duplicate a signer index (double counting) must fail
    bad = copy.deepcopy(proof2)
    bad.signers[1] = bad.signers[0]
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # tamper a signed message byte -> lane check fails
    bad = copy.deepcopy(proof2)
    m = bytearray(bad.signers[0].message)
    m[20] ^= 1
    bad.signers[0].message = bytes(m)
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # tamper the Ed25519 statement publics -> publics-reconstruction
    # consistency (and the STARK transcript) fails
    bad = copy.deepcopy(proof2)
    bad.batch.statements[1].public_inputs[0] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # tamper a lane final state (both the object field and the statement
    # publics, consistently) -> R binding / STARK verify fails
    bad = copy.deepcopy(proof2)
    bad.ed_finals[0][0] ^= 1
    from tendermintx_tpu.stark.ed25519_air import PUB_PER_SIG

    bad.batch.statements[1].public_inputs[160] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # tamper the hash statement publics -> hash STARK verify fails
    bad = copy.deepcopy(proof2)
    bad.batch.statements[0].public_inputs[0] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # swapping in a different trusted header breaks the transcript chain
    bad = copy.deepcopy(proof2)
    tb, th, tgt = 1, bytearray(trusted), 5
    th[0] ^= 1
    from tendermintx_tpu.circuits.skip import encode_skip_input

    bad.abi_inputs = encode_skip_input(tb, bytes(th), tgt)
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # challenge-hash statement is mandatory in v2 and cross-checked:
    # tampering its publics fails, claiming a wrong block count fails
    bad = copy.deepcopy(proof2)
    bad.batch.statements[2].public_inputs[0] ^= 1
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None
    bad = copy.deepcopy(proof2)
    bad.n_sha512_blocks *= 2
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None
    # dropping a statement from the batch must fail (one shared FRI binds
    # all three)
    bad = copy.deepcopy(proof2)
    bad.batch.statements = bad.batch.statements[:2]
    assert verify_skip_composite(bad, CHAIN_ID, SKIP_MAX) is None

    # field-mutation fuzz over the VALID serialized proof: every sampled
    # mutation must fail cleanly at deserialization or verify to None —
    # never raise, never be accepted (VERDICT r2 #7)
    import random

    from test_composite_fuzz import fuzz_composite_dict

    fuzz_composite_dict(
        proof.to_dict(),
        lambda p: verify_skip_composite(p, CHAIN_ID, SKIP_MAX),
        random.Random(3),
        n=12,
    )


def test_operator_composite_gate():
    """prove_composite: the operator's head advance is gated on standalone
    verification of the composite proof, not its own validity bit."""
    from tendermintx_tpu.runtime.operator import (
        MockContract,
        OperatorConfig,
        TendermintXOperator,
    )

    chain, f = _fetcher()
    genesis = chain.headers[1].hash()
    contract = MockContract(1, genesis, skip_max=SKIP_MAX)
    op = TendermintXOperator(
        OperatorConfig(
            chain_id=CHAIN_ID, max_validators=8, prove_composite=True
        ),
        contract=contract,
        fetcher=f,
    )
    result = op.tick(chain_tip=5)
    assert result == ("skip", 5)
    assert contract.latest_block() == 5
    assert contract.header_hash(5) == chain.headers[5].hash()
    cp = op.last_composite
    assert cp is not None and cp.kind == "skip"
    assert (
        verify_skip_composite(cp, CHAIN_ID, SKIP_MAX)
        == (1, genesis, 5, chain.headers[5].hash())
    )


def test_step_composite_end_to_end():
    chain, f = _fetcher()
    prev = chain.headers[3].hash()
    nxt = chain.headers[4].hash()
    inputs = f.get_step_inputs(3, prev, max_validators=8)
    proof = prove_step_composite(3, prev, inputs)

    proof2 = CompositeProof.from_dict(proof.to_dict())
    out = verify_step_composite(proof2, CHAIN_ID)
    assert out == (3, prev, nxt)

    assert verify_step_composite(proof2, "other-chain") is None

    bad = copy.deepcopy(proof2)
    bad.abi_output = bytes(32)
    assert verify_step_composite(bad, CHAIN_ID) is None

    bad = copy.deepcopy(proof2)
    bad.signers = bad.signers[:2]
    assert verify_step_composite(bad, CHAIN_ID) is None


REF_FIXTURES = "/root/reference/circuits/fixtures/mocha-4"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_FIXTURES),
    reason="reference fixtures not present",
)
def test_skip_composite_on_real_mocha4_fixtures():
    """Composite skip proof over the reference's recorded mocha-4 chain
    data (the reference's test_skip_small scenario, skip.rs:252-267 — but
    with the statement proven rather than natively recomputed)."""
    from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode

    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    trusted = f.get_signed_header_from_number(10000)
    target = f.get_signed_header_from_number(10500)
    inputs = f.get_skip_inputs(10000, trusted.header.hash(), 10500, 4)
    proof = prove_skip_composite(10000, trusted.header.hash(), 10500, inputs)
    out = verify_skip_composite(proof, "mocha-4", 100_800)
    assert out == (
        10000,
        trusted.header.hash(),
        10500,
        target.header.hash(),
    )
    # the challenge table is part of the batch on real data too
    assert proof.n_sha512_blocks > 0


def test_step_composite_nonzero_round():
    """Commits with round != 0 — the reference's own untested case
    (verify.rs:612) — prove and verify through the composite, including
    the 25-byte header-hash offset and the full 8-byte round binding."""
    # round != 0 adds 9 sign-bytes; with the 124-byte message cap
    # (consts.VALIDATOR_MESSAGE_BYTES_LENGTH_MAX, same as the reference)
    # that requires a chain id a few bytes shorter than CHAIN_ID
    cid = "r2-chain"
    chain = TestChain(n_validators=4, chain_id=cid)
    for _ in range(2):
        chain.extend()  # blocks 2, 3
    chain.extend(round=2)  # block 4: the commit this step proves
    tmp = tempfile.mkdtemp(prefix="composite_r2_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)

    prev = chain.headers[3].hash()
    inputs = f.get_step_inputs(3, prev, max_validators=4)
    proof = prove_step_composite(3, prev, inputs)
    assert proof.round == 2
    out = verify_step_composite(proof, cid)
    assert out == (3, prev, chain.headers[4].hash())

    # claiming round 0 for a round-2 commit shifts the hash window: reject
    bad = copy.deepcopy(proof)
    bad.round = 0
    assert verify_step_composite(bad, cid) is None
