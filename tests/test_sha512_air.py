"""SHA-512 compression AIR: digest bit-exact vs hashlib, STARK round trip."""

import hashlib

import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.ops.goldilocks import P
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.sha512_air import (
    PUB_PER_SEGMENT,
    Sha512Air,
    digest_halves_to_bytes,
    pad_message_512,
    schedule_messages_512,
    sha512_batch_trace,
)
from tendermintx_tpu.stark.verifier import verify

CFG = StarkConfig(rate_bits=2, n_queries=16, final_poly_len=8)


def test_trace_digest_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 111, bytes(range(96))):
        blocks = pad_message_512(msg)
        _, publics = sha512_batch_trace(
            blocks, [0] + [1] * (len(blocks) - 1)
        )
        last = PUB_PER_SEGMENT * (len(blocks) - 1)
        digest = digest_halves_to_bytes(publics[last + 32 : last + 48])
        assert digest == hashlib.sha512(msg).digest(), msg


def test_multiblock_chaining_matches_hashlib():
    # R ‖ A ‖ M for a 100-byte message = 164 bytes -> two 128-byte blocks
    msg = bytes(range(164 % 256)) + b"x" * 0
    msg = bytes((i * 7) % 256 for i in range(164))
    blocks, chain, spans = schedule_messages_512([msg, b"second", b"a" * 130])
    _, publics = sha512_batch_trace(blocks, chain)
    for m, (first, n_seg) in zip([msg, b"second", b"a" * 130], spans):
        last = PUB_PER_SEGMENT * (first + n_seg - 1)
        digest = digest_halves_to_bytes(publics[last + 32 : last + 48])
        assert digest == hashlib.sha512(m).digest()


def test_sha512_stark_roundtrip():
    blocks = pad_message_512(b"tendermintx-tpu sha512 air")
    trace, publics = sha512_batch_trace(blocks)
    air = Sha512Air(len(blocks))
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)


def test_sha512_multiblock_roundtrip_and_tampering():
    msg = bytes((i * 13 + 5) % 256 for i in range(164))
    blocks = pad_message_512(msg)
    assert len(blocks) == 2
    trace, publics = sha512_batch_trace(blocks, [0, 1])
    air = Sha512Air(2)
    proof = prove(air, trace, publics, CFG)
    assert verify(air, proof, CFG)
    # final digest matches hashlib
    digest = digest_halves_to_bytes(
        publics[PUB_PER_SEGMENT + 32 : PUB_PER_SEGMENT + 48]
    )
    assert digest == hashlib.sha512(msg).digest()

    # tampering the claimed digest fails
    bad = list(publics)
    bad[PUB_PER_SEGMENT + 32] = (bad[PUB_PER_SEGMENT + 32] + 1) % P
    assert not verify(air, prove(air, trace, bad, CFG), CFG)
    # tampering a message half fails
    bad = list(publics)
    bad[0] ^= 1
    assert not verify(air, prove(air, trace, bad, CFG), CFG)
    # breaking the chain flag (claiming block 2 restarts from H) fails
    bad = list(publics)
    bad[2 * PUB_PER_SEGMENT - 1] = 0
    assert not verify(air, prove(air, trace, bad, CFG), CFG)
