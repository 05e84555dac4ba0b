"""Ed25519 ladder trace generator vs the device witness kernel."""

import numpy as np
from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey

from tendermintx_tpu.ops import ed25519 as dev
from tendermintx_tpu.stark.ed25519_air import (
    N_BITS,
    N_COORD_COLS,
    ed25519_trace,
    ladder_final_matches,
    ladder_rows,
)


def make_sig(i=0, msg=b"ed25519 air trace"):
    key = Ed25519PrivateKey.from_private_bytes(bytes([i + 7] * 32))
    return key.public_key().public_bytes_raw(), msg, key.sign(msg)


def test_ladder_accepts_valid_signature():
    pk, msg, sig = make_sig()
    assert ladder_final_matches(pk, msg, sig)


def test_ladder_rejects_wrong_message():
    pk, msg, sig = make_sig()
    assert not ladder_final_matches(pk, msg + b"!", sig)


def test_trace_matches_device_ladder():
    """The host trace's final state must equal the device Straus kernel's
    result projectively (same formulas, limb vs int arithmetic)."""
    pk, msg, sig = make_sig(3)
    rows, table, R = ed25519_trace(pk, msg, sig)
    assert rows.shape == (N_COORD_COLS + 2, 256)
    # device kernel on the same signature
    ok = dev.verify_batch([pk], [msg], [sig])
    assert bool(ok[0])
    # final host ladder state passes the same projective check
    assert ladder_final_matches(pk, msg, sig)
    # sel bits decompose s and k exactly (reconstruct and compare)
    states, sels, _, _ = ladder_rows(pk, msg, sig)
    s_rec = 0
    for s_bit, _ in sels:
        s_rec = (s_rec << 1) | s_bit
    import hashlib

    s_val = int.from_bytes(sig[32:], "little")
    assert s_rec == s_val % (1 << N_BITS) and s_val < (1 << N_BITS)


def test_pad_rows_copy_final_state():
    pk, msg, sig = make_sig(5)
    rows, _, _ = ed25519_trace(pk, msg, sig)
    assert np.array_equal(rows[:, 253], rows[:, 255])
    assert np.array_equal(rows[:, N_BITS], rows[:, 254])
