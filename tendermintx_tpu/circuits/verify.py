"""Step/skip verification as jitted device programs.

TPU-native re-design of the reference's circuits/builder/verify.rs: the
`verify_step` (:469-506) and `verify_skip` (:528-563) circuit builders become
single batched tensor programs over the witness pytrees. Every check the
reference performs in-circuit is reproduced here as a boolean conjunction;
the prover layer turns the same computations into AIR traces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ed25519
from . import gadgets as g
from .consts import VARINT_BYTES_LENGTH_MAX
from .variables import HeaderProof, SkipWitness, StepWitness


# ---------------------------------------------------------------------------
# In-program protobuf varint marshaling (reference shared.rs:67-156)
# ---------------------------------------------------------------------------


def marshal_int64_varint(h_lo: jnp.ndarray, h_hi: jnp.ndarray):
    """Protobuf varint encoding of a u64 (MSB must be 0 — i64 non-negative,
    reference shared.rs:80). Returns (bytes (9,) u8, length ())."""
    septets = []
    for k in range(VARINT_BYTES_LENGTH_MAX):
        lo_shift = 7 * k
        if lo_shift < 32:
            s = (h_lo >> lo_shift) & 0x7F
            if lo_shift > 32 - 7:
                s = s | ((h_hi << (32 - lo_shift)) & 0x7F)
        else:
            s = (h_hi >> (lo_shift - 32)) & 0x7F
        septets.append(s)
    sep = jnp.stack(septets)  # (9,)
    nonzero = sep != 0
    # length = index of last nonzero septet + 1 (minimum 1)
    idx = jnp.arange(VARINT_BYTES_LENGTH_MAX)
    last_nz = jnp.max(jnp.where(nonzero, idx, 0))
    length = jnp.maximum(last_nz + 1, 1)
    cont = (idx < length - 1).astype(jnp.uint32)
    out = (sep | (cont << 7)).astype(jnp.uint8)
    out = jnp.where(idx < length, out, 0).astype(jnp.uint8)
    return out, length


def _height_leaf(h_lo, h_hi, width: int):
    """Expected 0x00-prefixed Int64Value header leaf for a height: the
    in-program analog of leaf_encode_marshalled_varint + verify_block_height
    (reference shared.rs:158-207)."""
    varint, vlen = marshal_int64_varint(h_lo, h_hi)
    leaf = jnp.zeros((width,), jnp.uint8)
    leaf = leaf.at[0].set(0x00)
    leaf = leaf.at[1].set(0x08)
    leaf = leaf.at[2 : 2 + VARINT_BYTES_LENGTH_MAX].set(varint)
    return leaf, vlen + 2


def _proof_root(p: HeaderProof):
    return g.header_proof_root(p.leaf_bytes, p.leaf_len, p.aunts, p.path_bits)[0]


def _leaf_hash_window(p: HeaderProof, start: int):
    """32 bytes of the proof leaf starting at `start` (incl. 0x00 prefix)."""
    return p.leaf_bytes[0, start : start + 32]


def _u64_pair(x):
    x = jnp.asarray(x, dtype=jnp.uint64) if False else x
    return x


def _lanes_checks(lanes, nb, round_, height_lo, height_hi, header_hash):
    """Checks shared by step and skip (reference verify_header,
    verify.rs:224-334): signatures (with full on-device witness binding —
    challenge SHA-512, Straus table, scalar bits all derived/validated from
    the raw bytes), message contents, enabled-lane shape, validators-hash
    recomputation, 2/3 voting power."""
    B = lanes.pubkeys.shape[0]
    sig_ok = jnp.all(
        ed25519.verify_bound(
            lanes.table_x, lanes.table_y, lanes.table_t, lanes.bits2,
            lanes.rx, lanes.ry, lanes.sig_r, lanes.sig_s, lanes.sig_pubkeys,
            lanes.messages, lanes.msg_len, lanes.k_q,
        )
    )
    # signed lanes must verify under the validator's own pubkey; the dummy
    # triple is only legal for unsigned lanes (conditional-verification
    # semantics of curta_eddsa_verify_sigs_conditional, verify.rs:248-259)
    pk_ok = jnp.all(
        ~lanes.signed | g.bytes_equal(lanes.sig_pubkeys, lanes.pubkeys)
    )
    msg_ok = jnp.all(
        g.message_checks(
            lanes.messages,
            lanes.msg_len,
            lanes.signed,
            round_,
            (height_lo, height_hi),
            header_hash,
        )
    )
    lane_shape_ok = jnp.all(
        lanes.enabled == (jnp.arange(B) < nb)
    ) & jnp.all(~lanes.signed | lanes.enabled)
    sig_ok = sig_ok & pk_ok
    leaf_digests = g.hash_validator_leaves(lanes.leaf_bytes, lanes.leaf_len)
    computed_vhash = g.merkle_root_dynamic(leaf_digests, nb)
    threshold_ok = g.voting_threshold_ok(
        lanes.vp_lo, lanes.vp_hi, lanes.signed, lanes.enabled, 2, 3
    )
    return sig_ok & msg_ok & lane_shape_ok & threshold_ok, computed_vhash


def step_verify(
    w: StepWitness,
    prev_header_hash: jnp.ndarray,  # (32,) u8
    prev_h_lo: jnp.ndarray,
    prev_h_hi: jnp.ndarray,
    chain_id_leaf: jnp.ndarray,  # (73,) u8 zero-padded expected leaf
    chain_id_leaf_len: jnp.ndarray,
):
    """Returns (valid: bool scalar, next_header (32,) u8).
    Mirrors reference verify_step (verify.rs:469-506)."""
    next_lo = prev_h_lo + 1
    carry = (next_lo == 0).astype(jnp.uint32)
    next_hi = prev_h_hi + carry

    base_ok, computed_vhash = _lanes_checks(
        w.lanes, w.nb_validators, w.round, next_lo, next_hi, w.next_header
    )

    # header Merkle proofs all bind to next_header
    vh_ok = g.bytes_equal(_proof_root(w.validators_hash_proof), w.next_header) & (
        g.bytes_equal(_leaf_hash_window(w.validators_hash_proof, 3), computed_vhash)
    )
    cid_ok = (
        g.bytes_equal(_proof_root(w.chain_id_proof), w.next_header)
        & g.bytes_equal(w.chain_id_proof.leaf_bytes[0], chain_id_leaf)
        & (w.chain_id_proof.leaf_len[0] == chain_id_leaf_len)
    )
    exp_leaf, exp_len = _height_leaf(next_lo, next_hi, w.height_proof.leaf_bytes.shape[1])
    h_ok = (
        g.bytes_equal(_proof_root(w.height_proof), w.next_header)
        & g.bytes_equal(w.height_proof.leaf_bytes[0], exp_leaf)
        & (w.height_proof.leaf_len[0] == exp_len)
    )
    # previous-header link via LAST_BLOCK_ID leaf (verify.rs:137-154)
    lbi_ok = g.bytes_equal(_proof_root(w.last_block_id_proof), w.next_header) & (
        g.bytes_equal(_leaf_hash_window(w.last_block_id_proof, 3), prev_header_hash)
    )
    # validator-set link via prev header's NEXT_VALIDATORS_HASH
    # (verify.rs:156-178)
    pnvh_ok = g.bytes_equal(_proof_root(w.prev_nvh_proof), prev_header_hash) & (
        g.bytes_equal(_leaf_hash_window(w.prev_nvh_proof, 3), computed_vhash)
    )

    valid = base_ok & vh_ok & cid_ok & h_ok & lbi_ok & pnvh_ok
    return valid, w.next_header


def skip_verify(
    w: SkipWitness,
    trusted_header_hash: jnp.ndarray,  # (32,) u8
    trusted_h_lo: jnp.ndarray,
    trusted_h_hi: jnp.ndarray,
    target_h_lo: jnp.ndarray,
    target_h_hi: jnp.ndarray,
    chain_id_leaf: jnp.ndarray,
    chain_id_leaf_len: jnp.ndarray,
    skip_max: int,
):
    """Returns (valid, target_header). Mirrors reference verify_skip
    (verify.rs:528-563): skip distance + trusted-validator 1/3 intersection
    + full header verification of the target block."""
    base_ok, computed_vhash = _lanes_checks(
        w.lanes, w.nb_target_validators, w.target_round, target_h_lo, target_h_hi,
        w.target_header,
    )

    vh_ok = g.bytes_equal(_proof_root(w.validators_hash_proof), w.target_header) & (
        g.bytes_equal(_leaf_hash_window(w.validators_hash_proof, 3), computed_vhash)
    )
    cid_ok = (
        g.bytes_equal(_proof_root(w.chain_id_proof), w.target_header)
        & g.bytes_equal(w.chain_id_proof.leaf_bytes[0], chain_id_leaf)
        & (w.chain_id_proof.leaf_len[0] == chain_id_leaf_len)
    )
    exp_leaf, exp_len = _height_leaf(
        target_h_lo, target_h_hi, w.height_proof.leaf_bytes.shape[1]
    )
    h_ok = (
        g.bytes_equal(_proof_root(w.height_proof), w.target_header)
        & g.bytes_equal(w.height_proof.leaf_bytes[0], exp_leaf)
        & (w.height_proof.leaf_len[0] == exp_len)
    )

    # trusted validators hash binds to the trusted header (verify.rs:361-437)
    trusted_leaves = g.hash_validator_leaves(
        w.trusted_lanes.leaf_bytes, w.trusted_lanes.leaf_len
    )
    trusted_vhash = g.merkle_root_dynamic(trusted_leaves, w.nb_trusted_validators)
    tvh_ok = g.bytes_equal(_proof_root(w.trusted_vh_proof), trusted_header_hash) & (
        g.bytes_equal(_leaf_hash_window(w.trusted_vh_proof, 3), trusted_vhash)
    )
    trusted_shape_ok = jnp.all(
        w.trusted_lanes.enabled
        == (jnp.arange(w.trusted_lanes.pubkeys.shape[0]) < w.nb_trusted_validators)
    )

    # 1/3 intersection over trusted voting power
    signed_mask = g.trusted_intersection_mask(
        w.lanes.pubkeys, w.lanes.signed & w.lanes.enabled, w.trusted_lanes.pubkeys
    )
    intersect_ok = g.voting_threshold_ok(
        w.trusted_lanes.vp_lo,
        w.trusted_lanes.vp_hi,
        signed_mask,
        w.trusted_lanes.enabled,
        1,
        3,
    )

    # skip distance: trusted + 1 < target <= trusted + SKIP_MAX
    # (verify.rs:508-526)
    lo_plus, hi_plus = g.u64_add((trusted_h_lo, trusted_h_hi), (jnp.uint32(1), jnp.uint32(0)))
    gt_ok = g.u64_gt((target_h_lo, target_h_hi), (lo_plus, hi_plus))
    max_lo, max_hi = g.u64_add(
        (trusted_h_lo, trusted_h_hi),
        (jnp.uint32(skip_max & 0xFFFFFFFF), jnp.uint32(skip_max >> 32)),
    )
    le_ok = ~g.u64_gt((target_h_lo, target_h_hi), (max_lo, max_hi))

    valid = base_ok & vh_ok & cid_ok & h_ok & tvh_ok & trusted_shape_ok & (
        intersect_ok & gt_ok & le_ok
    )
    return valid, w.target_header


step_verify_jit = jax.jit(step_verify)
skip_verify_jit = jax.jit(skip_verify, static_argnames=("skip_max",))


def chain_id_leaf_const(chain_id: str, width: int = 73):
    """Expected 0x00-prefixed StringValue leaf for the chain id
    (reference verify_chain_id, verify.rs:180-222)."""
    body = chain_id.encode()
    full = b"\x00" + b"\x0a" + bytes([len(body)]) + body
    arr = np.zeros((width,), dtype=np.uint8)
    arr[: len(full)] = np.frombuffer(full, dtype=np.uint8)
    return jnp.asarray(arr), jnp.asarray(np.uint32(len(full)))
