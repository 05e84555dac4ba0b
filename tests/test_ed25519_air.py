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


# ---------------------------------------------------------------------------
# Full constraint AIR
# ---------------------------------------------------------------------------


def test_air_trace_generator_matches_oracle():
    from tendermintx_tpu.stark.ed25519_air import (
        PUB_PER_SIG,
        Ed25519Air,
        P25519,
        check_lane_publics,
        ed25519_air_trace,
    )

    pks, msgs, sigs = zip(*[make_sig(i, b"air oracle %d" % i) for i in range(2)])
    trace, publics = ed25519_air_trace(list(pks), list(msgs), list(sigs))
    air = Ed25519Air(2)
    assert trace.shape == (air.n_cols, air.n_rows)
    assert air.validate_publics(publics)
    for i in range(2):
        states, _, _, R = ladder_rows(pks[i], msgs[i], sigs[i])
        X, Y, Z, _ = states[-1]
        seg = publics[PUB_PER_SIG * i : PUB_PER_SIG * (i + 1)]
        fin = [
            sum(int(seg[160 + 20 * g + j]) << (13 * j) for j in range(20))
            for g in range(3)
        ]
        assert fin[0] % P25519 == X and fin[1] % P25519 == Y and fin[2] % P25519 == Z
        assert check_lane_publics(seg, pks[i], msgs[i], sigs[i])
        assert not check_lane_publics(seg, pks[i], msgs[i] + b"!", sigs[i])
        assert not check_lane_publics(seg, pks[1 - i], msgs[i], sigs[i])


def test_air_constraints_vanish_on_trace():
    """Direct host evaluation of every constraint group on sampled rows of a
    real trace — the cheap full-soundness check behind the STARK."""
    import numpy as np

    from tendermintx_tpu.stark import ed25519_air as ea
    from tendermintx_tpu.stark.air import (
        Frame,
        HostAlgebra,
        HostFelt,
        flatten_host_constraints,
    )

    pk, msg, sig = make_sig(11, b"constraint vanish")
    trace, publics = ea.ed25519_air_trace([pk], [msg], [sig])
    air = ea.Ed25519Air(1)
    n = air.n_rows
    gamma = (1234567890123, 98765432109)
    aux = air.aux_columns(trace, [gamma], publics)
    combined = np.concatenate([trace.to_ints(), aux.to_ints()], axis=0)
    pats = air.periodic_columns()
    pubcols = air.public_columns(publics, n)
    alg = HostAlgebra()

    def frame_at(t):
        rows = [
            [
                HostFelt((int(combined[i][(t + k) % n]), 0))
                for i in range(combined.shape[0])
            ]
            for k in air.frame_offsets
        ]
        return Frame(
            rows=rows,
            public=[HostFelt((int(v), 0)) for v in publics],
            periodic=[HostFelt((int(p[t % len(p)]), 0)) for p in pats],
            public_cols=[HostFelt((int(c[t]), 0)) for c in pubcols],
            challenges=[HostFelt((gamma[0], 0)), HostFelt((gamma[1], 0))],
        )

    for t in [0, 1, 2, 180, 251, 252, 253, 255]:
        f = frame_at(t)
        for c in flatten_host_constraints(air.eval_cyclic(f, alg)):
            assert c.v == (0, 0), f"cyclic nonzero at row {t}"
        if t == 0:
            for c in flatten_host_constraints(air.eval_first(f, alg)):
                assert c.v == (0, 0)
        if t != n - 1:
            for c in flatten_host_constraints(air.eval_transition(f, alg)):
                assert c.v == (0, 0), f"transition nonzero at row {t}"
    f = frame_at(n - 1)
    for c in flatten_host_constraints(air.eval_last(f, alg)):
        assert c.v == (0, 0)
    # sanity: a corrupted sel bit breaks a cyclic constraint
    combined[ea.COL_SEL0][5] ^= 1
    bad = frame_at(5)
    vals = [
        c.v for c in flatten_host_constraints(air.eval_cyclic(bad, alg))
    ]
    assert any(v != (0, 0) for v in vals)
