"""Recursive wrapper STARK tests (stark/recursion.py).

Oracle for the per-row permutation layout: ops.poseidon.permute_ints /
_permute_ints_py with intermediate states recomputed independently here.
"""

import numpy as np
import pytest

from tendermintx_tpu.ops import poseidon as ps
from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark import recursion as rec

rng = np.random.default_rng(7)


def _perm_intermediates(state):
    """Host oracle: (S1..S3, p4..p25, w26..w29, out) via the plain int
    permutation loop, mirroring _permute_ints_py."""
    rc = ps.round_constants()
    s = [v % P for v in state]
    S = []
    for r in range(4):
        pre = [(x + c) % P for x, c in zip(s, rc[r])]
        s = ps._mds_int([ps._sbox_int(x) for x in pre])
        S.append(list(s))  # S[r] = state before round r+1
    p_vals = []
    for r in range(4, 26):
        pre = [(x + c) % P for x, c in zip(s, rc[r])]
        p_vals.append(pre[0])
        pre[0] = ps._sbox_int(pre[0])
        s = ps._mds_int(pre)
    w = [list(s)]  # w26
    for r in range(26, 29):
        pre = [(x + c) % P for x, c in zip(s, rc[r])]
        s = ps._mds_int([ps._sbox_int(x) for x in pre])
        w.append(list(s))
    pre = [(x + c) % P for x, c in zip(s, rc[29])]
    out = ps._mds_int([ps._sbox_int(x) for x in pre])
    return S[:3], p_vals, w, out


def test_partial_affine_matches_permutation():
    """The precomputed affine coefficients reproduce every partial-round
    lane-0 input and the round-26 entry state."""
    state = [int(rng.integers(0, 2**63)) % P for _ in range(12)]
    S, p_vals, w, out = _perm_intermediates(state)
    assert out == ps._permute_ints_py(state)

    rc = ps.round_constants()
    s3 = S[2]
    pre = [(x + c) % P for x, c in zip(s3, rc[3])]
    s4 = ps._mds_int([ps._sbox_int(x) for x in pre])
    q = [pow(pv, 7, P) for pv in p_vals]
    basis = s4 + q + [1]
    p_rows, w26_rows = rec._partial_affine()
    for r in range(22):
        got = sum(c * b for c, b in zip(p_rows[r], basis)) % P
        assert got == p_vals[r], f"partial round {r} affine mismatch"
    for j in range(12):
        got = sum(c * b for c, b in zip(w26_rows[j], basis)) % P
        assert got == w[0][j], f"w26 lane {j} affine mismatch"


def test_expand_perm_states_matches_oracle():
    R = 5
    states = [
        [int(rng.integers(0, 2**63)) % P for _ in range(12)] for _ in range(R)
    ]
    dev = rec.expand_perm_states(
        GF.from_ints(np.array(states, dtype=object))
    ).to_ints()
    for r in range(R):
        S, p_vals, w, _ = _perm_intermediates(states[r])
        want = (
            [v for lane in S for v in lane]
            + p_vals
            + [v for lane in w for v in lane]
        )
        got = [int(dev[c][r]) for c in range(106)]
        assert got == want, f"row {r} expansion mismatch"


# ---------------------------------------------------------------------------
# Wrapping a toy batch
# ---------------------------------------------------------------------------

from tendermintx_tpu.stark.air import Air
from tendermintx_tpu.stark.batch import prove_batch, verify_batch
from tendermintx_tpu.stark.prover import StarkConfig
from tendermintx_tpu.stark.recursion import (
    WrapAir,
    verify_wrapped_batch,
    wrap_batch,
    wrap_shape,
)

CFG = StarkConfig(
    rate_bits=2, n_queries=4, final_poly_len=8, proof_of_work_bits=4,
    cap_bits=3,
)
WRAP_CFG = StarkConfig(
    rate_bits=3, n_queries=4, final_poly_len=8, proof_of_work_bits=2,
    cap_bits=2,
)
SEED = [11, 22]


class MixAir(Air):
    """Tiny multiplicative-mix AIR (mirrors tests/test_batch.py)."""

    n_cols = 4
    n_public = 2
    constraint_degree = 3
    frame_offsets = [0, 1]

    def eval_transition(self, frame, alg):
        a, b, c, d = frame.local
        return [
            frame.next[0] - (a * b + c),
            frame.next[1] - b,
            frame.next[2] - (c + d),
            frame.next[3] - d,
        ]

    def eval_first(self, frame, alg):
        return [frame.local[0] - frame.public[0], frame.local[1] - frame.public[1]]


def _mk_trace(air, n, p0, p1):
    cols = [[p0], [p1], [3], [5]]
    a, b, c, d = p0, p1, 3, 5
    for _ in range(n - 1):
        a, b, c, d = (a * b + c) % P, b, (c + d) % P, d
        for col, v in zip(cols, (a, b, c, d)):
            col.append(v)
    return GF.from_ints(np.array(cols, dtype=object))


def _toy_batch():
    airs = [MixAir(), MixAir()]
    traces = [_mk_trace(airs[0], 64, 2, 3), _mk_trace(airs[1], 128, 4, 9)]
    publics = [[2, 3], [4, 9]]
    return airs, traces, publics


@pytest.fixture(scope="module")
def toy_wrapped():
    airs, traces, publics = _toy_batch()
    proof = prove_batch(airs, traces, publics, CFG, transcript_seed=SEED)
    assert verify_batch(airs, proof, CFG, transcript_seed=SEED)
    wrapped = wrap_batch(airs, proof, CFG, transcript_seed=SEED,
                         wrap_config=WRAP_CFG)
    return airs, proof, wrapped


def test_wrap_roundtrip(toy_wrapped):
    airs, _proof, wrapped = toy_wrapped
    assert verify_wrapped_batch(
        airs, wrapped, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )


def test_wrap_rejects_wrong_seed(toy_wrapped):
    airs, _proof, wrapped = toy_wrapped
    assert not verify_wrapped_batch(
        airs, wrapped, CFG, transcript_seed=[11, 23], wrap_config=WRAP_CFG
    )


def test_wrap_rejects_tampered_cap(toy_wrapped):
    import copy

    airs, _proof, wrapped = toy_wrapped
    bad = copy.deepcopy(wrapped)
    bad.statements[0].trace_cap[0][0] ^= 1
    assert not verify_wrapped_batch(
        airs, bad, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )


def test_wrap_rejects_tampered_wrapper_publics(toy_wrapped):
    import copy

    airs, _proof, wrapped = toy_wrapped
    bad = copy.deepcopy(wrapped)
    pub = bad.wrapper.statements[0].public_inputs
    pub[0] = (pub[0] + 1) % P
    assert not verify_wrapped_batch(
        airs, bad, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )


def test_wrap_rejects_tampered_final_poly(toy_wrapped):
    import copy

    airs, _proof, wrapped = toy_wrapped
    bad = copy.deepcopy(wrapped)
    c0, c1 = bad.final_poly[0]
    bad.final_poly[0] = ((c0 + 1) % P, c1)
    assert not verify_wrapped_batch(
        airs, bad, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )


def test_wrap_rejects_smuggled_openings(toy_wrapped):
    import copy

    airs, proof, wrapped = toy_wrapped
    bad = copy.deepcopy(wrapped)
    bad.statements[0].openings = dict(proof.statements[0].openings)
    assert not verify_wrapped_batch(
        airs, bad, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )


def test_wrapped_batch_serialize_roundtrip(toy_wrapped):
    import json

    from tendermintx_tpu.stark.serialize import (
        wrapped_batch_from_dict,
        wrapped_batch_to_dict,
    )

    airs, _proof, wrapped = toy_wrapped
    blob = json.dumps(wrapped_batch_to_dict(wrapped))
    w2 = wrapped_batch_from_dict(json.loads(blob))
    assert verify_wrapped_batch(
        airs, w2, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
    )
    # smuggled openings on the wire are rejected at the boundary
    d = json.loads(blob)
    d["statements"][0]["openings"] = [[0, "", [], "", [], "", []]]
    with pytest.raises(ValueError):
        wrapped_batch_from_dict(d)


def test_wrapped_wire_fuzz_rejects_cleanly(toy_wrapped):
    """Mutated wrapped-batch dicts must fail CLEANLY: either a ValueError
    family at the parse boundary or verify_wrapped_batch -> False — never
    an uncaught exception, never acceptance."""
    import json

    from tendermintx_tpu.stark.serialize import (
        _pack as _recursion_pack,
        wrapped_batch_from_dict,
        wrapped_batch_to_dict,
    )

    airs, _proof, wrapped = toy_wrapped
    good = wrapped_batch_to_dict(wrapped)

    def mutate(fn):
        d = json.loads(json.dumps(good))
        fn(d)
        return d

    def w_pubs(d, v):
        d["wrapper"]["statements"][0]["public_inputs"] = v

    cases = [
        mutate(lambda d: d.pop("layer_caps")),
        mutate(lambda d: d.__setitem__("layer_caps", [])),
        mutate(lambda d: d.__setitem__("layer_caps", ["!!!not-base64!!!"])),
        mutate(lambda d: d.__setitem__("final_poly", "AAAA")),
        mutate(lambda d: d.__setitem__("pow_nonce", "99999999999999999999999999")),
        mutate(lambda d: d["statements"].pop()),
        mutate(lambda d: d["statements"][0].__setitem__("n_rows", 3)),
        mutate(lambda d: d["statements"][0].__setitem__("n_rows", -64)),
        mutate(lambda d: d["statements"][1].__setitem__("ood_trace", [])),
        mutate(lambda d: d["wrapper"]["statements"][0].__setitem__("n_rows", 8)),
        mutate(lambda d: d["wrapper"]["statements"][1].__setitem__("n_rows", 8)),
        mutate(lambda d: d["wrapper"]["statements"][0].__setitem__("openings", [])),
        mutate(lambda d: d["wrapper"]["statements"][1].__setitem__("openings", [])),
        mutate(lambda d: d["wrapper"]["statements"].pop()),
        mutate(lambda d: d["wrapper"]["fri"].__setitem__("query_rounds", [])),
        # smuggling WRONG wrapper publics (the wire form carries none —
        # the verifier derives them) must fail the equality check
        mutate(lambda d: w_pubs(d, _recursion_pack([1, 2, 3]))),
        mutate(lambda d: d["statements"][0].__setitem__("trace_cap", "AAAA")),
    ]
    accepted = 0
    for i, bad in enumerate(cases):
        try:
            w2 = wrapped_batch_from_dict(bad)
        except (ValueError, KeyError, TypeError, IndexError, OverflowError):
            continue  # clean parse-boundary rejection
        ok = verify_wrapped_batch(
            airs, w2, CFG, transcript_seed=SEED, wrap_config=WRAP_CFG
        )
        assert ok is False, f"fuzz case {i} accepted or raised"
        accepted += 0
