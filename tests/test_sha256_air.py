"""SHA-256 compression AIR: digest bit-exact vs hashlib, STARK round trip."""

import copy
import hashlib

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.ops.goldilocks import P
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.sha256_air import (
    Sha256Air,
    digest_words_to_bytes,
    pad_single_block,
    sha256_block_trace,
)
from tendermintx_tpu.stark.verifier import verify

CFG = StarkConfig(rate_bits=2, n_queries=16, final_poly_len=8)


def test_trace_digest_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 55, bytes(range(47))):
        block = pad_single_block(msg)
        _, publics = sha256_block_trace(block)
        assert digest_words_to_bytes(publics[16:24]) == hashlib.sha256(msg).digest()


def test_sha256_stark_roundtrip():
    block = pad_single_block(b"tendermintx-tpu sha256 air")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air(1)
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)


def test_wrong_digest_rejected():
    block = pad_single_block(b"abc")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air(1)
    bad_publics = list(publics)
    bad_publics[16] = (bad_publics[16] + 1) % P
    proof = prove(air, trace, bad_publics, CFG)
    assert not verify(air, proof, CFG)


def test_wrong_message_rejected():
    block = pad_single_block(b"abc")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air(1)
    bad_publics = list(publics)
    bad_publics[0] ^= 1  # claim a different first message word
    proof = prove(air, trace, bad_publics, CFG)
    assert not verify(air, proof, CFG)


def test_tampered_trace_root_rejected():
    block = pad_single_block(b"xyz")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air(1)
    proof = prove(air, trace, publics, CFG)
    bad = copy.deepcopy(proof)
    bad.trace_cap[0][0] = (bad.trace_cap[0][0] + 1) % P
    assert not verify(air, bad, CFG)


def test_sha256_batch_validator_leaves():
    """BASELINE config 2 essence: all validator leaves of a header proven in
    one batched trace."""
    import os

    from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
    from tendermintx_tpu.stark.sha256_air import sha256_batch_trace

    fix = "/root/reference/circuits/fixtures/mocha-4"
    if not os.path.isdir(fix):
        import pytest

        pytest.skip("reference fixtures not present")
    f = InputDataFetcher(fixture_path=fix, mode=InputDataMode.FIXTURE)
    vals = f.get_validator_set_from_number(10500)  # 3 validators
    leaves = [b"\x00" + v.simple_encode() for v in vals]
    leaves.append(b"\x00")  # pad batch to 4
    blocks = [pad_single_block(l) for l in leaves]
    trace, publics = sha256_batch_trace(blocks)
    air = Sha256Air(4)
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)
    for i, leaf in enumerate(leaves):
        got = digest_words_to_bytes(publics[25 * i + 16 : 25 * i + 24])
        assert got == hashlib.sha256(leaf).digest()
    # cross-segment tamper: swap two segments' digests
    bad = list(publics)
    bad[16:24], bad[41:49] = bad[41:49], bad[16:24]
    p2 = prove(air, trace, bad, CFG)
    assert not verify(air, p2, CFG)


def test_multiblock_chained_digests():
    """Merkle inner nodes (65 B) and validator messages (~120 B) span 2-3
    blocks; the chained trace must reproduce hashlib digests."""
    from tendermintx_tpu.stark.sha256_air import schedule_messages, sha256_batch_trace

    msgs = [bytes(range(65)), b"m" * 119, b"x" * 124, b"abc"]
    blocks, chain, spans = schedule_messages(msgs)
    trace, publics = sha256_batch_trace(blocks, chain)
    for m, (start, n) in zip(msgs, spans):
        last = start + n - 1
        got = digest_words_to_bytes(publics[25 * last + 16 : 25 * last + 24])
        assert got == hashlib.sha256(m).digest()


def test_multiblock_stark_roundtrip_and_chain_tamper():
    from tendermintx_tpu.stark.sha256_air import schedule_messages, sha256_batch_trace

    msgs = [bytes(range(65)), b"q" * 100]  # 2 + 2 blocks
    blocks, chain, spans = schedule_messages(msgs)
    trace, publics = sha256_batch_trace(blocks, chain)
    air = Sha256Air(len(blocks))
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)
    # flipping a chain flag changes the claimed IV derivation: reject
    bad = list(publics)
    bad[25 * 1 + 24] = 0  # segment 1 claimed fresh instead of chained
    p2 = prove(air, trace, bad, CFG)
    assert not verify(air, p2, CFG)
    # tampering an intermediate (non-final) digest public breaks chaining
    bad2 = list(publics)
    bad2[25 * 0 + 16] ^= 1
    p3 = prove(air, trace, bad2, CFG)
    assert not verify(air, p3, CFG)
