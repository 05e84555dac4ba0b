"""SHA-256 compression AIR: digest bit-exact vs hashlib, STARK round trip."""

import copy
import hashlib

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
        assert digest_words_to_bytes(publics[16:]) == hashlib.sha256(msg).digest()


def test_sha256_stark_roundtrip():
    block = pad_single_block(b"tendermintx-tpu sha256 air")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air()
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)


def test_wrong_digest_rejected():
    block = pad_single_block(b"abc")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air()
    bad_publics = list(publics)
    bad_publics[16] = (bad_publics[16] + 1) % P
    proof = prove(air, trace, bad_publics, CFG)
    assert not verify(air, proof, CFG)


def test_wrong_message_rejected():
    block = pad_single_block(b"abc")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air()
    bad_publics = list(publics)
    bad_publics[0] ^= 1  # claim a different first message word
    proof = prove(air, trace, bad_publics, CFG)
    assert not verify(air, proof, CFG)


def test_tampered_trace_root_rejected():
    block = pad_single_block(b"xyz")
    trace, publics = sha256_block_trace(block)
    air = Sha256Air()
    proof = prove(air, trace, publics, CFG)
    bad = copy.deepcopy(proof)
    bad.trace_root[0] = (bad.trace_root[0] + 1) % P
    assert not verify(air, bad, CFG)
