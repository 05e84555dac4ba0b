"""Device gadgets for Tendermint header verification.

TPU-native re-design of the reference's circuit gadget layer
(circuits/builder/{shared,validator,voting}.rs): instead of gate-by-gate
circuit construction, each gadget is a batched tensor program over validator
lanes / proof lanes. These run as the witness/verification programs now and
double as the trace generators for the AIR layer.

Conventions: bytes are uint8 arrays; 64-bit integers (voting power) are
(lo, hi) uint32 pairs; digests are uint8 (…, 32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sha256

# ---------------------------------------------------------------------------
# Byte/block helpers
# ---------------------------------------------------------------------------


def bytes_to_blocks(data: jnp.ndarray, byte_len: jnp.ndarray, n_blocks: int):
    """SHA-256-pad lanes of bytes on device.

    data: (B, max_bytes) uint8 (zero right-padded), byte_len: (B,).
    Returns (blocks (B, n_blocks, 16) uint32, n_active (B,)).
    max_bytes must fit in n_blocks*64 - 9 at the per-lane level (caller
    guarantees byte_len <= n_blocks*64 - 9).
    """
    B, max_bytes = data.shape
    total = n_blocks * 64
    buf = jnp.zeros((B, total), jnp.uint8)
    buf = buf.at[:, :max_bytes].set(data)
    idx = jnp.arange(total)[None, :]
    # zero out anything at or beyond byte_len, set 0x80 at byte_len
    buf = jnp.where(idx < byte_len[:, None], buf, 0).astype(jnp.uint8)
    buf = jnp.where(idx == byte_len[:, None], jnp.uint8(0x80), buf)
    # per-lane block count: smallest nb with byte_len + 9 <= nb*64
    n_active = (byte_len + 9 + 63) // 64
    # bit length (64-bit big-endian) at the end of the last active block
    bitlen = (byte_len.astype(jnp.uint32) * 8).astype(jnp.uint32)
    last = n_active * 64 - 8  # start byte of the 8-byte length field
    # only the low 4 bytes can be nonzero for our sizes
    for k in range(4):
        shift = 8 * (3 - k)
        byte_val = ((bitlen >> shift) & 0xFF).astype(jnp.uint8)
        buf = buf.at[jnp.arange(B), last + 4 + k].set(byte_val)
    words = (
        buf.reshape(B, n_blocks, 16, 4).astype(jnp.uint32)
    )
    blocks = (
        (words[..., 0] << 24)
        | (words[..., 1] << 16)
        | (words[..., 2] << 8)
        | words[..., 3]
    )
    return blocks, n_active


def digests_to_bytes_dev(digests: jnp.ndarray) -> jnp.ndarray:
    """(B, 8) uint32 -> (B, 32) uint8 big-endian."""
    B = digests.shape[0]
    b0 = (digests >> 24) & 0xFF
    b1 = (digests >> 16) & 0xFF
    b2 = (digests >> 8) & 0xFF
    b3 = digests & 0xFF
    return (
        jnp.stack([b0, b1, b2, b3], axis=-1).astype(jnp.uint8).reshape(B, 32)
    )


def sha256_bytes_var(data: jnp.ndarray, byte_len: jnp.ndarray, n_blocks: int):
    """Variable-length SHA-256 of byte lanes -> (B, 32) uint8 digests.
    Equivalent of `curta_sha256_variable` (reference shared.rs:182-194)."""
    blocks, n_active = bytes_to_blocks(data, byte_len, n_blocks)
    return digests_to_bytes_dev(sha256.sha256_blocks(blocks, n_active))


# ---------------------------------------------------------------------------
# Validator hashing (reference validator.rs:209-252)
# ---------------------------------------------------------------------------


def hash_validator_leaves(leaf_bytes: jnp.ndarray, leaf_len: jnp.ndarray):
    """leaf_bytes: (B, 47) uint8 = 0x00 ‖ SimpleValidator encoding (padded),
    leaf_len: (B,) true lengths (including the 0x00 prefix). -> (B, 32)."""
    return sha256_bytes_var(leaf_bytes, leaf_len, n_blocks=1)


def merkle_root_dynamic(leaf_digests: jnp.ndarray, n_enabled: jnp.ndarray):
    """CometBFT variable-size Merkle root over the first n_enabled of B
    leaf digests (B a power of two). Level-wise pair-and-promote is
    equivalent to the largest-power-of-two split recursion (RFC 6962).

    leaf_digests: (B, 32) uint8; n_enabled: () dynamic. -> (32,) uint8.
    Equivalent of plonky2x `get_root_from_hashed_leaves` (SURVEY.md N7).
    """
    B = leaf_digests.shape[0]
    Bp = 1 << max((B - 1).bit_length(), 0)
    if Bp != B:
        # non-power-of-two lane counts (e.g. the reference's Celestia
        # VALIDATOR_SET_SIZE_MAX=100): pad with junk rows — never selected,
        # every level keeps only the first n live nodes
        leaf_digests = jnp.concatenate(
            [leaf_digests, jnp.zeros((Bp - B, 32), jnp.uint8)], axis=0
        )
    levels = Bp.bit_length() - 1
    nodes = leaf_digests
    n = n_enabled.astype(jnp.int32)
    for _ in range(levels):
        half = nodes.shape[0] // 2
        left = nodes[0::2]
        right = nodes[1::2]
        prefix = jnp.full((half, 1), 0x01, jnp.uint8)
        pair_input = jnp.concatenate([prefix, left, right], axis=1)  # (half, 65)
        pair_len = jnp.full((half,), 65, jnp.int32)
        merged = sha256_bytes_var(pair_input, pair_len, n_blocks=2)
        n_pairs = n // 2
        odd = n % 2
        idx = jnp.arange(half)
        # node i of next level: merged[i] if i < n_pairs; the promoted odd
        # leaf nodes[n-1] if odd and i == n_pairs; else junk (zeros)
        promoted = nodes[jnp.maximum(n - 1, 0)]
        take_merge = (idx < n_pairs)[:, None]
        take_promote = ((idx == n_pairs) & (odd == 1))[:, None]
        nodes = jnp.where(
            take_merge, merged, jnp.where(take_promote, promoted[None, :], 0)
        ).astype(jnp.uint8)
        n = n_pairs + odd
    return nodes[0]


# ---------------------------------------------------------------------------
# Header-field Merkle proofs (fixed depth 4; reference shared.rs:45-65,
# verify.rs:137-222)
# ---------------------------------------------------------------------------


def header_proof_root(
    leaf_bytes: jnp.ndarray,
    leaf_len: jnp.ndarray,
    aunts: jnp.ndarray,
    path_bits: jnp.ndarray,
):
    """Batched fixed-depth-4 header Merkle proof evaluation.

    leaf_bytes: (B, L) uint8 (0x00-prefixed leaf, padded), leaf_len: (B,),
    aunts: (B, 4, 32) uint8, path_bits: (B, 4) uint32 (1 = current node is
    the RIGHT child). -> roots (B, 32) uint8."""
    digest = sha256_bytes_var(leaf_bytes, leaf_len, n_blocks=2)
    B = digest.shape[0]
    for d in range(4):
        aunt = aunts[:, d, :]
        bit = path_bits[:, d][:, None]
        left = jnp.where(bit == 1, aunt, digest)
        right = jnp.where(bit == 1, digest, aunt)
        prefix = jnp.full((B, 1), 0x01, jnp.uint8)
        inp = jnp.concatenate([prefix, left, right], axis=1)
        digest = sha256_bytes_var(inp, jnp.full((B,), 65, jnp.int32), n_blocks=2)
    return digest


# ---------------------------------------------------------------------------
# 64-bit voting-power arithmetic ((lo, hi) uint32 pairs;
# reference voting.rs)
# ---------------------------------------------------------------------------


def u64_add(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def u64_sum_masked(vp_lo, vp_hi, mask):
    """Tree-sum of masked voting powers. mask: (B,) bool/int."""
    m = mask.astype(jnp.uint32)
    lo = vp_lo * m
    hi = vp_hi * m
    n = lo.shape[0]
    pad = (1 << max((n - 1).bit_length(), 0)) - n
    if pad:  # non-power-of-two lane counts (e.g. max_validators=100)
        z = jnp.zeros((pad,), jnp.uint32)
        lo = jnp.concatenate([lo, z])
        hi = jnp.concatenate([hi, z])
        n += pad
    while n > 1:
        half = n // 2
        lo2, hi2 = u64_add((lo[:half], hi[:half]), (lo[half:], hi[half:]))
        lo, hi = lo2, hi2
        n = half
    return lo[0], hi[0]


def u64_mul_small(a, c: int):
    """(lo, hi) * small constant c (c <= 8). CometBFT caps total voting
    power at i64::MAX/8 so c*vp fits in 64 bits (reference voting.rs:1-4)."""
    lo, hi = a
    out_lo = jnp.zeros_like(lo)
    out_hi = jnp.zeros_like(hi)
    for _ in range(c):
        out_lo, out_hi = u64_add((out_lo, out_hi), (lo, hi))
    return out_lo, out_hi


def u64_gt(a, b):
    """a > b for (lo, hi) pairs."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] > b[0]))


def voting_threshold_ok(vp_lo, vp_hi, included_mask, enabled_mask, num: int, den: int):
    """included voting power * den > total voting power * num
    (reference voting.rs:66-109 / verify.rs:439-467)."""
    inc = u64_sum_masked(vp_lo, vp_hi, included_mask & enabled_mask)
    tot = u64_sum_masked(vp_lo, vp_hi, enabled_mask)
    return u64_gt(u64_mul_small(inc, den), u64_mul_small(tot, num))


# ---------------------------------------------------------------------------
# Signed-message checks (reference validator.rs:81-183)
# ---------------------------------------------------------------------------


def message_checks(
    messages: jnp.ndarray,
    msg_len: jnp.ndarray,
    signed: jnp.ndarray,
    round_: jnp.ndarray,
    expected_height: jnp.ndarray,
    header_hash: jnp.ndarray,
):
    """Per-lane checks that each signed message is a Precommit for the right
    (height, round, header hash).

    messages: (B, 124) uint8; msg_len: (B,) uint32 — the byte length the
    signature covers (the SHA-512 challenge hashes messages[:msg_len], so
    every checked byte must lie inside that window); signed: (B,) bool;
    round_: () uint32 (commit round); expected_height: () uint64 as
    (lo, hi) uint32 pair; header_hash: (32,) uint8. Returns (B,) bool —
    True where the lane is consistent (unsigned lanes are vacuously
    True)."""
    B = messages.shape[0]
    # precommit marker [8, 2] at bytes 1..2 (reference validator.rs:104-110)
    is_precommit = (messages[:, 1] == 8) & (messages[:, 2] == 2)
    # sfixed64 LE height at bytes 4..12 (validator.rs:113-123)
    h_lo = (
        messages[:, 4].astype(jnp.uint32)
        | (messages[:, 5].astype(jnp.uint32) << 8)
        | (messages[:, 6].astype(jnp.uint32) << 16)
        | (messages[:, 7].astype(jnp.uint32) << 24)
    )
    h_hi = (
        messages[:, 8].astype(jnp.uint32)
        | (messages[:, 9].astype(jnp.uint32) << 8)
        | (messages[:, 10].astype(jnp.uint32) << 16)
        | (messages[:, 11].astype(jnp.uint32) << 24)
    )
    height_ok = (h_lo == expected_height[0]) & (h_hi == expected_height[1])
    # round: when round != 0, byte 12 is the sfixed64 tag 0x19 and bytes
    # 13..21 hold the round LE. All 8 bytes are compared (the reference
    # checks ROUND_START_IDX..+8, validator.rs:126-142): the commit round is
    # a u32 here, so the high word must be exactly zero — which also
    # enforces verify_non_negative_round (validator.rs:73-78), since the
    # sfixed64 sign bit lives in byte 20.
    r_lo = (
        messages[:, 13].astype(jnp.uint32)
        | (messages[:, 14].astype(jnp.uint32) << 8)
        | (messages[:, 15].astype(jnp.uint32) << 16)
        | (messages[:, 16].astype(jnp.uint32) << 24)
    )
    r_hi = (
        messages[:, 17].astype(jnp.uint32)
        | (messages[:, 18].astype(jnp.uint32) << 8)
        | (messages[:, 19].astype(jnp.uint32) << 16)
        | (messages[:, 20].astype(jnp.uint32) << 24)
    )
    round_ok = jnp.where(
        round_ == 0,
        jnp.ones((B,), bool),
        (messages[:, 12] == 0x19) & (r_lo == round_) & (r_hi == 0),
    )
    # header hash at offset 16 (round == 0) or 25 (round != 0)
    # (verify_hash_in_message, validator.rs:155-183)
    off = jnp.where(round_ == 0, 16, 25)
    idx = off + jnp.arange(32)
    window = messages[:, idx]  # (B, 32)
    hash_ok = jnp.all(window == header_hash[None, :], axis=1)
    # every byte this function inspects must be covered by the signature:
    # the hash window is the furthest read (bytes beyond msg_len are NOT
    # signed, so a short signed prefix with unsigned tail bytes placed to
    # satisfy these checks must be rejected)
    len_ok = (msg_len >= off + 32) & (msg_len <= jnp.uint32(messages.shape[1]))
    ok = is_precommit & height_ok & round_ok & hash_ok & len_ok
    return jnp.where(signed, ok, True)


def bytes_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# Trusted-validator intersection (reference verify.rs:391-437)
# ---------------------------------------------------------------------------


def trusted_intersection_mask(
    target_pubkeys: jnp.ndarray,
    target_signed: jnp.ndarray,
    trusted_pubkeys: jnp.ndarray,
):
    """For each trusted validator j: did any signing target validator i have
    the same pubkey? O(N^2) pubkey match, vectorized.

    target_pubkeys: (B, 32) uint8; target_signed: (B,) bool;
    trusted_pubkeys: (B, 32) uint8. -> (B,) bool."""
    eq = jnp.all(
        target_pubkeys[:, None, :] == trusted_pubkeys[None, :, :], axis=-1
    )  # (i, j)
    return jnp.any(eq & target_signed[:, None], axis=0)
