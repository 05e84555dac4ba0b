"""Gadget-level unit tests for the signed-message checks.

Analog of the reference's builder/validator.rs unit tests, including the
full-width sfixed64 round comparison (validator.rs:126-142) and the
non-negative-round semantics (validator.rs:73-78): a message whose round
field agrees with the commit round only in the low 32 bits must be
rejected.
"""

import jax.numpy as jnp
import numpy as np

from tendermintx_tpu.circuits import gadgets as g
from tendermintx_tpu.inputs.conversion import get_validator_data_from_block
from tendermintx_tpu.inputs.testchain import TestChain


def _msg_arrays(chain, height):
    commit = chain.commits[height]
    lanes = get_validator_data_from_block(
        chain.val_set, commit, chain.chain_id, len(chain.val_set)
    )
    msgs = np.stack([np.frombuffer(l.message, dtype=np.uint8) for l in lanes])
    msg_len = np.array([l.message_byte_length for l in lanes], dtype=np.uint32)
    signed = np.array([l.signed for l in lanes])
    header_hash = np.frombuffer(chain.headers[height].hash(), dtype=np.uint8)
    height_pair = (
        jnp.uint32(height & 0xFFFFFFFF),
        jnp.uint32(height >> 32),
    )
    return (msgs, msg_len), signed, header_hash, height_pair, commit.round


def _run_checks(msgs, signed, rnd, height_pair, header_hash, msg_len=None):
    m, ml = msgs if isinstance(msgs, tuple) else (msgs, msg_len)
    return np.asarray(
        g.message_checks(
            jnp.asarray(m),
            jnp.asarray(ml),
            jnp.asarray(signed),
            jnp.uint32(rnd),
            height_pair,
            jnp.asarray(header_hash),
        )
    )


def test_message_checks_accepts_valid_nonzero_round():
    chain = TestChain(n_validators=2)
    h = chain.extend(round=5)
    (msgs, mlen), signed, hh, hp, rnd = _msg_arrays(chain, h)
    assert rnd == 5
    ok = _run_checks((msgs, mlen), signed, rnd, hp, hh)
    assert ok.all()


def test_message_checks_rejects_high_round_word():
    # sfixed64 round encoding 5 + 2^32 must NOT pass as round 5 even though
    # the low 32 bits match (the pre-fix behavior flagged in ADVICE.md).
    chain = TestChain(n_validators=2)
    h = chain.extend(round=5)
    (msgs, mlen), signed, hh, hp, rnd = _msg_arrays(chain, h)
    forged = msgs.copy()
    forged[0, 17] = 1  # adds 2^32 to the encoded round
    ok = _run_checks((forged, mlen), signed, rnd, hp, hh)
    assert not ok[0]
    assert ok[1]


def test_message_checks_rejects_negative_round():
    # two's-complement -(2^32 - 5) has low word 5: the sign bit (and the
    # whole high word) must be checked, mirroring verify_non_negative_round.
    chain = TestChain(n_validators=2)
    h = chain.extend(round=5)
    (msgs, mlen), signed, hh, hp, rnd = _msg_arrays(chain, h)
    forged = msgs.copy()
    neg = (1 << 64) - (1 << 32) + 5
    for i in range(8):
        forged[0, 13 + i] = (neg >> (8 * i)) & 0xFF
    ok = _run_checks((forged, mlen), signed, rnd, hp, hh)
    assert not ok[0]
    assert ok[1]


def test_message_checks_rejects_unsigned_hash_window():
    # If the claimed signed length ends before the header-hash window, the
    # hash bytes are unsigned tail bytes and the lane must be rejected.
    chain = TestChain(n_validators=2)
    h = chain.extend(round=5)
    (msgs, mlen), signed, hh, hp, rnd = _msg_arrays(chain, h)
    short = mlen.copy()
    short[0] = 40  # < 25 + 32
    ok = _run_checks((msgs, short), signed, rnd, hp, hh)
    assert not ok[0]
    assert ok[1]
