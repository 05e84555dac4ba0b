"""Hash-composition layer: plan wiring + end-to-end proven hash statements.

The slow tests prove the FULL hash layer of a step/skip statement (validator
leaves -> dynamic CometBFT Merkle tree -> validators_hash leaf -> header
root, plus chain-id / height / link proofs) as ONE Sha256Air STARK and check
the composition verifier extracts the validator encodings while rejecting
tampered statements.
"""

import hashlib
import tempfile

import pytest

from tendermintx_tpu.circuits import hashing as hz
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.tendermint import merkle_root
from tendermintx_tpu.inputs.testchain import TestChain
from tendermintx_tpu.stark.sha256_air import (
    PUB_PER_SEGMENT,
    pad_message,
    schedule_messages,
    sha256_batch_trace,
)


def _plan_publics(plan, data_map, aunt_map, total):
    """Trace-generator publics for a plan (no STARK — wiring-only tests)."""
    digests = []
    messages = []
    for j, job in enumerate(plan.jobs):
        if job[0] == "data":
            msg = data_map[j]
        else:
            _, left, right = job
            lb = digests[left[1]] if left[0] == "job" else aunt_map[j]
            rb = digests[right[1]] if right[0] == "job" else aunt_map[j]
            msg = b"\x01" + lb + rb
        messages.append(msg)
        digests.append(hashlib.sha256(msg).digest())
    blocks, chain, _ = schedule_messages(messages)
    while len(blocks) < total:
        blocks.append(pad_message(b"")[0])
        chain.append(0)
    _, publics = sha256_batch_trace(blocks, chain)
    return publics, digests


def test_merkle_plan_wiring_matches_native_root():
    plan = hz.Plan()
    leaves = [plan.data(1) for _ in range(5)]  # non-power-of-two set
    root = hz.add_merkle_tree(plan, leaves)
    data_map = {j: bytes([40 + j]) * (38 + j) for j in leaves}
    publics, _ = _plan_publics(plan, data_map, {}, 16)
    res = hz.check_plan(plan, publics, 16)
    assert res is not None
    want = merkle_root([data_map[j][1:] for j in leaves])
    # native merkle_root hashes 0x00||slice; our data already includes the
    # 0x00 prefix, so compare against the raw recursion instead:
    want = _cometbft_root([data_map[j] for j in leaves])
    assert res.digests[root] == want
    for j in leaves:
        assert res.data[j] == data_map[j]


def _cometbft_root(preimages):
    from tendermintx_tpu.inputs.tendermint import get_split_point

    if len(preimages) == 1:
        return hashlib.sha256(preimages[0]).digest()
    k = get_split_point(len(preimages))
    l = _cometbft_root(preimages[:k])
    r = _cometbft_root(preimages[k:])
    return hashlib.sha256(b"\x01" + l + r).digest()


def test_plan_wiring_rejects_forged_child_digest():
    plan = hz.Plan()
    leaves = [plan.data(1) for _ in range(4)]
    hz.add_merkle_tree(plan, leaves)
    data_map = {j: bytes([50 + j]) * 40 for j in leaves}
    publics, _ = _plan_publics(plan, data_map, {}, 16)
    # tamper: replace an inner node's claimed left-child digest bytes in its
    # message words (segment of the first inner job)
    spans = plan.spans()
    inner_seg = spans[4][0]  # first inner job
    bad = list(publics)
    bad[PUB_PER_SEGMENT * inner_seg + 1] ^= 1  # inside left digest
    assert hz.check_plan(plan, bad, 16) is None


def test_plan_wiring_rejects_bad_padding_and_chain():
    plan = hz.Plan()
    j0 = plan.data(1)
    publics, _ = _plan_publics(plan, {j0: b"hello"}, {}, 4)
    res = hz.check_plan(plan, publics, 4)
    assert res is not None and res.data[j0] == b"hello"
    # non-canonical bit length
    bad = list(publics)
    bad[15] += 4  # length field low word
    assert hz.check_plan(plan, bad, 4) is None
    # chained first segment
    bad2 = list(publics)
    bad2[24] = 1
    assert hz.check_plan(plan, bad2, 4) is None


# ---------------------------------------------------------------------------
# End-to-end proven statements (slow: real STARKs)
# ---------------------------------------------------------------------------


def _synthetic_fetcher(n_validators=4, blocks=4):
    chain = TestChain(n_validators=n_validators, chain_id="hash-chain")
    for _ in range(blocks):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="hashing_fixtures_")
    chain.write_fixtures(tmp)
    return chain, InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)


@pytest.mark.slow
def test_skip_hash_bundle_end_to_end():
    chain, f = _synthetic_fetcher()
    trusted = chain.headers[1].hash()
    target = chain.headers[5].hash()
    inputs = f.get_skip_inputs(1, trusted, 5, max_validators=8)
    bundle = hz.prove_skip_hashes(inputs)

    # serialization round-trip
    bundle2 = hz.HashBundle.from_dict(bundle.to_dict())
    facts = hz.verify_skip_hashes(
        bundle2, "hash-chain", trusted, target, target_height=5
    )
    assert facts is not None
    # the extracted encodings are exactly the validator set's
    want = [v.simple_encode() for v in chain.val_set]
    assert facts.target_encodings == want
    assert facts.trusted_encodings == want
    assert facts.target_validators_hash == chain.vhash

    # statement tampering: wrong target header / height / chain id
    assert hz.verify_skip_hashes(bundle2, "hash-chain", trusted, bytes(32), 5) is None
    assert hz.verify_skip_hashes(bundle2, "hash-chain", trusted, target, 6) is None
    assert hz.verify_skip_hashes(bundle2, "other-chain", trusted, target, 5) is None
    assert hz.verify_skip_hashes(bundle2, "hash-chain", bytes(32), target, 5) is None

    # proof tampering: claim a different validator leaf byte
    import copy

    bad = copy.deepcopy(bundle)
    bad.proof.public_inputs[0] ^= 1
    assert hz.verify_skip_hashes(bad, "hash-chain", trusted, target, 5) is None


@pytest.mark.slow
def test_step_hash_bundle_end_to_end():
    chain, f = _synthetic_fetcher()
    prev = chain.headers[3].hash()
    nxt = chain.headers[4].hash()
    inputs = f.get_step_inputs(3, prev, max_validators=8)
    bundle = hz.prove_step_hashes(inputs)
    facts = hz.verify_step_hashes(bundle, "hash-chain", prev, nxt, next_height=4)
    assert facts is not None
    assert facts.encodings == [v.simple_encode() for v in chain.val_set]
    assert facts.validators_hash == chain.vhash
    # header-chain link: wrong prev header must fail (the LAST_BLOCK_ID
    # binding), wrong next header too
    assert hz.verify_step_hashes(bundle, "hash-chain", bytes(32), nxt, 4) is None
    assert hz.verify_step_hashes(bundle, "hash-chain", prev, bytes(32), 4) is None
