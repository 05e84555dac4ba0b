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


# ---------------------------------------------------------------------------
# On-device witness binding (challenge SHA-512, table, scalar bits)
# ---------------------------------------------------------------------------


def test_verify_bound_accepts_and_rejects():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey

    from tendermintx_tpu.ops import ed25519 as ed

    keys = [Ed25519PrivateKey.from_private_bytes(bytes([i]) * 32) for i in range(1, 5)]
    msgs = [bytes(f"bind msg {i} ", "ascii") * (i + 3) for i in range(4)]
    pks = [k.public_key().public_bytes_raw() for k in keys]
    sigs = [k.sign(m) for k, m in zip(keys, msgs)]
    assert ed.verify_batch_bound(pks, msgs, sigs).all()

    # tampered message fails through the on-device challenge hash
    bad = list(msgs)
    bad[1] = bytes([msgs[1][0] ^ 1]) + msgs[1][1:]
    out = ed.verify_batch_bound(pks, bad, sigs)
    assert not out[1] and out[0] and out[2] and out[3]

    # forged witness data (bits2 / table) rejected even with valid bytes
    args = list(ed.prepare_batch(pks, msgs, sigs))
    bind = ed.prepare_binding(pks, msgs, sigs)
    m = np.zeros((4, 124), np.uint8)
    ml = np.zeros((4,), np.uint32)
    for i, mm in enumerate(msgs):
        m[i, : len(mm)] = np.frombuffer(mm, np.uint8)
        ml[i] = len(mm)
    fn = jax.jit(ed.verify_bound)

    bits2 = np.asarray(args[3]).copy()
    bits2[2, 5] ^= 1
    forged = args.copy()
    forged[3] = jnp.asarray(bits2)
    assert not np.asarray(fn(*forged, *bind[:3], jnp.asarray(m), jnp.asarray(ml), bind[3]))[2]

    tx = np.asarray(args[0]).copy()
    ty = np.asarray(args[1]).copy()
    tt = np.asarray(args[2]).copy()
    other = ed.pt_neg(ed.decompress(pks[0]))
    tx[3, 2] = ed.int_to_limbs(other[0])
    ty[3, 2] = ed.int_to_limbs(other[1])
    tt[3, 2] = ed.int_to_limbs(other[0] * other[1] % ed.P25519)
    forged2 = args.copy()
    forged2[0] = jnp.asarray(tx)
    forged2[1] = jnp.asarray(ty)
    forged2[2] = jnp.asarray(tt)
    assert not np.asarray(fn(*forged2, *bind[:3], jnp.asarray(m), jnp.asarray(ml), bind[3]))[3]
