"""Native Tendermint layer: bit-exact fixture validation + synthetic chain.

Reference-fixture tests read the recorded mocha-4 RPC JSON directly from the
read-only reference checkout (not copied into this repo); they skip if that
path is absent. Synthetic-chain tests are fully hermetic.
"""

import os

import pytest

from tendermintx_tpu.circuits.consts import VALIDATORS_HASH_INDEX
from tendermintx_tpu.inputs.conversion import (
    DUMMY_PUBLIC_KEY,
    get_validator_data_from_block,
)
from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
from tendermintx_tpu.inputs.tendermint import (
    Header,
    Validator,
    encode_varint,
    get_split_point,
    is_valid_skip,
    merkle_root,
    proofs_from_byte_slices,
    validators_hash,
    verify_merkle_proof,
)
from tendermintx_tpu.inputs.testchain import TestChain

REF_FIXTURES = "/root/reference/circuits/fixtures/mocha-4"
HAS_REF = os.path.isdir(REF_FIXTURES)

ref = pytest.mark.skipif(not HAS_REF, reason="reference fixtures not present")


# -- pure helpers ------------------------------------------------------------


def test_varint_vectors():
    # vectors from the protobuf spec
    assert encode_varint(0) == b"\x00"
    assert encode_varint(1) == b"\x01"
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    assert encode_varint(300) == b"\xac\x02"
    assert encode_varint(2**64 - 1) == b"\xff" * 9 + b"\x01"


def test_get_split_point():
    assert [get_split_point(n) for n in (2, 3, 4, 5, 7, 8, 9, 100)] == [
        1, 2, 2, 4, 4, 4, 8, 64,
    ]


def test_merkle_proofs_nonpow2():
    for n in (1, 2, 3, 5, 7, 14):
        items = [bytes([i]) * (i + 1) for i in range(n)]
        root, proofs = proofs_from_byte_slices(items)
        assert root == merkle_root(items)
        for i, item in enumerate(items):
            assert verify_merkle_proof(root, proofs[i], item), (n, i)
        if n > 1:
            assert not verify_merkle_proof(root, proofs[0], items[1] + b"x")


# -- reference fixtures (bit-exact) -----------------------------------------


@ref
def test_header_hash_matches_fixtures():
    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    for height in (3000, 3001, 3100, 10000, 10001, 10500, 10501, 157001):
        signed = f.get_signed_header_from_number(height)
        assert signed.header.hash() == signed.commit.block_id.hash, height


@ref
def test_validators_hash_matches_fixtures():
    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    for height in (3000, 3100, 10000, 10500, 157001):
        signed = f.get_signed_header_from_number(height)
        vals = f.get_validator_set_from_number(height)
        assert validators_hash(vals).hex().upper() == signed.header_rpc["validators_hash"]


@ref
def test_step_inputs_from_fixtures():
    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    prev = f.get_signed_header_from_number(10000)
    inputs = f.get_step_inputs(10000, prev.header.hash(), max_validators=4)
    nxt = f.get_signed_header_from_number(10001)
    assert inputs.next_header == nxt.header.hash()
    assert inputs.nb_validators == 2
    assert sum(1 for v in inputs.next_block_validators if v.signed) == 2
    assert sum(1 for v in inputs.next_block_validators if v.enabled) == 2
    assert len(inputs.next_block_validators) == 4
    # proofs verify against the respective headers
    assert verify_merkle_proof(
        nxt.header.hash(),
        inputs.next_header_validators_hash_proof,
        inputs.next_header_validators_hash_leaf,
    )
    assert verify_merkle_proof(
        prev.header.hash(),
        inputs.prev_header_next_validators_hash_proof,
        inputs.prev_header_next_validators_hash_leaf,
    )
    # the validators-hash leaf embeds the raw hash: 0a 20 <32 bytes>
    assert inputs.next_header_validators_hash_leaf[2:34] == bytes.fromhex(
        nxt.header_rpc["validators_hash"]
    )


@ref
def test_skip_inputs_from_fixtures():
    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    trusted = f.get_signed_header_from_number(10000)
    inputs = f.get_skip_inputs(10000, trusted.header.hash(), 10500, max_validators=4)
    target = f.get_signed_header_from_number(10500)
    assert inputs.target_header == target.header.hash()
    assert inputs.nb_target_validators == 3
    assert inputs.nb_trusted_validators == 2
    assert verify_merkle_proof(
        trusted.header.hash(),
        inputs.trusted_header_validators_hash_proof,
        inputs.trusted_header_validators_hash_leaf,
    )


@ref
def test_is_valid_skip_on_fixtures():
    f = InputDataFetcher(fixture_path=REF_FIXTURES, mode=InputDataMode.FIXTURE)
    trusted_vals = f.get_validator_set_from_number(10000)
    target_vals = f.get_validator_set_from_number(10500)
    target_commit = f.get_signed_header_from_number(10500).commit
    assert is_valid_skip(trusted_vals, target_vals, target_commit)


# -- synthetic chain ---------------------------------------------------------


def test_testchain_self_consistent(tmp_path):
    chain = TestChain(n_validators=4)
    for _ in range(3):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    for h in (2, 3, 4):
        signed = f.get_signed_header_from_number(h)
        assert signed.header.hash() == signed.commit.block_id.hash
        vals = f.get_validator_set_from_number(h)
        assert validators_hash(vals) == signed.header.validators_hash
    inputs = f.get_step_inputs(2, chain.headers[2].hash(), max_validators=8)
    assert inputs.next_header == chain.headers[3].hash()


def test_testchain_nonzero_round():
    # closes the reference's known test gap (verify.rs:612)
    chain = TestChain(n_validators=4)
    h = chain.extend(round=3)
    commit = chain.commits[h]
    assert commit.round == 3
    vals = chain.val_set
    lanes = get_validator_data_from_block(vals, commit, chain.chain_id, 8)
    assert all(v.signed for v in lanes[:4])  # signatures verified natively


def test_testchain_absent_validators():
    chain = TestChain(n_validators=4, powers=[10, 10, 10, 10])
    h = chain.extend(signers=[0, 1, 2])  # one absent
    lanes = get_validator_data_from_block(
        chain.val_set, chain.commits[h], chain.chain_id, 8
    )
    assert [v.signed for v in lanes[:4]] == [True, True, True, False]
    assert lanes[3].enabled and lanes[3].voting_power == 10
    assert all(not v.enabled and v.pubkey == DUMMY_PUBLIC_KEY for v in lanes[4:])


def test_is_valid_skip_thresholds():
    # 4 equal validators: 2/4 signing fails the 2/3 rule; 3/4 passes
    chain = TestChain(n_validators=4, powers=[10, 10, 10, 10])
    h_ok = chain.extend(signers=[0, 1, 2])
    assert is_valid_skip(chain.val_set, chain.val_set, chain.commits[h_ok])
    h_bad = chain.extend(signers=[0, 1])
    assert not is_valid_skip(chain.val_set, chain.val_set, chain.commits[h_bad])
    # disjoint trusted set -> no intersection -> invalid
    other = TestChain(n_validators=4, seed=b"other chain")
    assert not is_valid_skip(other.val_set, chain.val_set, chain.commits[h_ok])


def test_find_block_to_request(tmp_path):
    chain = TestChain(n_validators=4)
    for _ in range(6):
        chain.extend()
    chain.write_fixtures(str(tmp_path))
    f = InputDataFetcher(fixture_path=str(tmp_path), mode=InputDataMode.FIXTURE)
    assert f.find_block_to_request(1, 7) == 7
