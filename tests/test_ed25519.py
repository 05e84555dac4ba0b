"""Batched Ed25519 device verification vs cryptography-library oracle."""

import numpy as np
import pytest
from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey

from tendermintx_tpu.ops import ed25519

rng = np.random.default_rng(21)


def make_sigs(n):
    out = []
    for i in range(n):
        key = Ed25519PrivateKey.from_private_bytes(bytes([i + 1] * 32))
        msg = bytes(rng.integers(0, 256, size=40 + i, dtype=np.uint8))
        sig = key.sign(msg)
        pk = key.public_key().public_bytes_raw()
        out.append((pk, msg, sig))
    return out


def test_host_oracle_matches_library():
    for pk, msg, sig in make_sigs(4):
        assert ed25519.verify_ints(pk, msg, sig)
        assert not ed25519.verify_ints(pk, msg + b"x", sig)


def test_field_limb_ops():
    import jax

    from tendermintx_tpu.ops.ed25519 import (
        P25519,
        fadd,
        fmul,
        fsub,
        int_to_limbs,
        limbs_to_int,
        to_canonical,
    )

    vals = [0, 1, P25519 - 1, 2**254 + 12345, 19, (1 << 255) - 20]
    a_np = np.stack([int_to_limbs(v % P25519) for v in vals])
    b_np = np.stack([int_to_limbs((v * 31 + 7) % P25519) for v in vals])
    import jax.numpy as jnp

    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    add_out = jax.jit(lambda a, b: to_canonical(fadd(a, b)))(a, b)
    sub_out = jax.jit(lambda a, b: to_canonical(fsub(a, b)))(a, b)
    mul_out = jax.jit(lambda a, b: to_canonical(fmul(a, b)))(a, b)
    for i, v in enumerate(vals):
        x = v % P25519
        y = (v * 31 + 7) % P25519
        assert limbs_to_int(np.asarray(add_out)[i]) == (x + y) % P25519
        assert limbs_to_int(np.asarray(sub_out)[i]) == (x - y) % P25519
        assert limbs_to_int(np.asarray(mul_out)[i]) == (x * y) % P25519


def test_device_batch_verify():
    sigs = make_sigs(6)
    ok = ed25519.verify_batch(
        [s[0] for s in sigs], [s[1] for s in sigs], [s[2] for s in sigs]
    )
    assert ok.tolist() == [True] * 6


def test_device_rejects_bad():
    sigs = make_sigs(4)
    pks = [s[0] for s in sigs]
    msgs = [s[1] for s in sigs]
    ss = [s[2] for s in sigs]
    # tamper: wrong message on lane 1, swapped signature on lane 3
    msgs[1] = msgs[1][:-1] + bytes([msgs[1][-1] ^ 1])
    ss[3] = sigs[0][2]
    ok = ed25519.verify_batch(pks, msgs, ss)
    assert ok.tolist() == [True, False, True, False]


def test_prepare_rejects_malformed():
    sigs = make_sigs(1)
    with pytest.raises(ValueError):
        # scalar s >= L
        bad_sig = sigs[0][2][:32] + (ed25519.L_ORDER + 5).to_bytes(32, "little")
        ed25519.prepare_batch([sigs[0][0]], [sigs[0][1]], [bad_sig])
