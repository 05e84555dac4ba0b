"""Sharded pipeline pieces on a virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tendermintx_tpu.circuits import gadgets as g
from tendermintx_tpu.inputs.conversion import get_validator_data_from_block
from tendermintx_tpu.inputs.testchain import TestChain
from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.ops import poseidon as ps
from tendermintx_tpu.parallel.sharding import (
    make_lane_mesh,
    sharded_lane_checks,
    sharded_poseidon_throughput,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need the virtual 8-device mesh"
    return make_lane_mesh(8)


@pytest.fixture(autouse=True)
def _release_executables():
    """Drop live compiled programs between tests: each test in this file
    compiles multi-GB sharded graphs, and XLA:CPU has been observed to
    SIGABRT mid-eager-dispatch once several of them accumulate in one
    process (the disk cache makes recompiles cheap)."""
    yield
    jax.clear_caches()


def test_sharded_poseidon_matches_single(mesh):
    rng = np.random.default_rng(3)
    states = [[int(rng.integers(0, 2**63)) % P for _ in range(12)] for _ in range(64)]
    x = GF.from_ints(np.array(states, dtype=object))
    out_sharded = sharded_poseidon_throughput(mesh)(x)
    out_single = jax.jit(ps.permute)(x)
    assert out_sharded.to_ints().tolist() == out_single.to_ints().tolist()


@pytest.mark.slow
def test_sharded_prove_identical_to_single_chip(mesh):
    """prove(mesh=...) — column-sharded LDEs, halo-exchange quotient,
    sharded DEEP + leaf hashing — must emit byte-identical proofs. Uses the
    SHA-256 AIR (frame offsets up to 16 exercise the ppermute halo)."""
    import hashlib

    from tendermintx_tpu.stark.prover import StarkConfig, prove
    from tendermintx_tpu.stark.serialize import stark_proof_to_dict
    from tendermintx_tpu.stark.sha256_air import (
        Sha256Air,
        pad_message,
        schedule_messages,
        sha256_batch_trace,
    )
    from tendermintx_tpu.stark.verifier import verify

    msgs = [bytes([i]) * (20 + i) for i in range(6)] + [b"x" * 90]  # 8 segs
    blocks, chain_flags, _ = schedule_messages(msgs)
    trace, publics = sha256_batch_trace(blocks, chain_flags)
    air = Sha256Air(len(blocks))
    cfg = StarkConfig(rate_bits=2, n_queries=12, final_poly_len=8)
    single = prove(air, trace, publics, cfg)
    sharded = prove(air, trace, publics, cfg, mesh=mesh)
    assert stark_proof_to_dict(sharded) == stark_proof_to_dict(single)
    assert verify(air, sharded, cfg)


def test_sharded_lane_checks_matches_single(mesh):
    chain = TestChain(n_validators=13, powers=[7 + i for i in range(13)])
    h = chain.extend(signers=list(range(11)))
    lanes = get_validator_data_from_block(chain.val_set, chain.commits[h], chain.chain_id, 16)
    from tendermintx_tpu.circuits.variables import pack_validator_lanes

    lv = pack_validator_lanes(lanes)
    fn = sharded_lane_checks(mesh)
    sig_ok, digests, signed_power, total_power = fn(
        lv.table_x, lv.table_y, lv.table_t, lv.bits2, lv.rx, lv.ry,
        lv.sig_r, lv.sig_s, lv.sig_pubkeys, lv.messages, lv.msg_len, lv.k_q,
        lv.leaf_bytes, lv.leaf_len, lv.vp_lo, lv.vp_hi, lv.signed, lv.enabled,
    )
    assert bool(sig_ok)
    # digests match the single-device gadget
    single = g.hash_validator_leaves(lv.leaf_bytes, lv.leaf_len)
    assert np.array_equal(np.asarray(digests), np.asarray(single))
    # exact voting sums
    want_total = sum(v.voting_power for v in chain.val_set)
    want_signed = sum(chain.val_set[i].voting_power for i in range(11))
    got_total = int(total_power[0]) | (int(total_power[1]) << 32)
    got_signed = int(signed_power[0]) | (int(signed_power[1]) << 32)
    assert got_total == want_total
    assert got_signed == want_signed


def test_sharded_ntt_matches_single(mesh):
    """Four-step all-to-all NTT (SURVEY §2c axis 3) must equal the
    single-chip NTT exactly, values and order."""
    import numpy as np

    from tendermintx_tpu.ops import ntt as nttmod
    from tendermintx_tpu.ops.goldilocks import GF, P
    from tendermintx_tpu.parallel.prover import sharded_ntt_fn

    rng = np.random.default_rng(11)
    for log_n in (6, 9, 12):
        n = 1 << log_n
        coeffs = GF.from_ints(
            np.array(
                [int(rng.integers(0, 2**63)) % P for _ in range(n)],
                dtype=object,
            )
        )
        want = nttmod.ntt(coeffs)
        got = sharded_ntt_fn(mesh, log_n)(coeffs)
        assert (np.asarray(want.lo) == np.asarray(got.lo)).all()
        assert (np.asarray(want.hi) == np.asarray(got.hi)).all()


@pytest.mark.slow
def test_sharded_prove_ed25519_air(mesh):
    """The Ed25519 AIR — the widest table (2k+ columns, LogUp aux phase) —
    proven over the mesh must be byte-identical to single-chip (VERDICT r2
    next-step #3)."""
    from tendermintx_tpu.inputs.conversion import (
        DUMMY_MESSAGE,
        DUMMY_PUBLIC_KEY,
        DUMMY_SIGNATURE,
    )
    from tendermintx_tpu.stark.ed25519_air import Ed25519Air, ed25519_air_trace
    from tendermintx_tpu.stark.prover import StarkConfig, prove
    from tendermintx_tpu.stark.serialize import stark_proof_to_dict
    from tendermintx_tpu.stark.verifier import verify

    chain = TestChain(n_validators=2)
    h = chain.extend()
    lanes = get_validator_data_from_block(
        chain.val_set, chain.commits[h], chain.chain_id, 2
    )
    real = next(l for l in lanes if l.signed)
    pks = [real.pubkey, DUMMY_PUBLIC_KEY]
    msgs = [real.message[: real.message_byte_length], DUMMY_MESSAGE]
    sigs = [real.signature, DUMMY_SIGNATURE]
    trace, publics = ed25519_air_trace(pks, msgs, sigs)
    air = Ed25519Air(2)
    cfg = StarkConfig(rate_bits=2, n_queries=4, final_poly_len=16)
    single = prove(air, trace, publics, cfg)
    sharded = prove(air, trace, publics, cfg, mesh=mesh)
    assert stark_proof_to_dict(sharded) == stark_proof_to_dict(single)
    assert verify(air, sharded, cfg)


@pytest.mark.slow
def test_sharded_composite_matches_single(mesh):
    """prove_skip_composite(mesh=...) — all three statements AND the
    shared batch FRI folds over the mesh — byte-identical serialized proof
    (VERDICT r2 next-step #3: the mesh wired through the composite)."""
    import tempfile

    from tendermintx_tpu.circuits.composite import (
        prove_skip_composite,
        verify_skip_composite,
    )
    from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
    from tendermintx_tpu.stark.prover import StarkConfig

    chain = TestChain(n_validators=2, chain_id="mesh-chain")
    for _ in range(4):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="mesh_fixtures_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
    trusted = chain.headers[1].hash()
    inputs = f.get_skip_inputs(1, trusted, 4, max_validators=2)
    # reduced config (72 "bits") so the CPU-mesh test stays tractable; the
    # verifier floor is overridden explicitly
    cfg = StarkConfig(rate_bits=2, n_queries=28, final_poly_len=64)
    single = prove_skip_composite(1, trusted, 4, inputs, config=cfg)
    sharded = prove_skip_composite(1, trusted, 4, inputs, config=cfg, mesh=mesh)
    import json

    assert json.dumps(sharded.to_dict(), sort_keys=True) == json.dumps(
        single.to_dict(), sort_keys=True
    )
    out = verify_skip_composite(
        sharded, "mesh-chain", 100, config=cfg, min_security_bits=0
    )
    assert out == (1, trusted, 4, chain.headers[4].hash())
