"""Batched SHA-256 over lanes of variable-length messages (witness kernel).

TPU-native equivalent of the witness-generation side of the reference's
SHA-256 STARK gadget (`curta_sha256_variable`, consumed at
/root/reference/circuits/builder/shared.rs:194, validator.rs:228,
verify.rs:202). One lane = one message; messages are host-padded to a fixed
number of 64-byte blocks, with a per-lane active-block count reproducing the
variable-length semantics inside a fixed-shape tensor program.

Everything is uint32 vector ops — runs on the VPU; rounds are rolled with
`lax.fori_loop` to keep XLA graphs small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress_block(state, block):
    """state: (..., 8) uint32; block: (..., 16) uint32 words."""
    k = jnp.asarray(_K)

    def schedule_step(t, w):
        # w: (..., 64) with first 16 filled; compute w[t]
        w15 = w[..., t - 15]
        w2 = w[..., t - 2]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
        wt = w[..., t - 16] + s0 + w[..., t - 7] + s1
        return w.at[..., t].set(wt)

    w = jnp.concatenate(
        [block, jnp.zeros(block.shape[:-1] + (48,), jnp.uint32)], axis=-1
    )
    w = jax.lax.fori_loop(16, 64, schedule_step, w)

    def round_step(t, vars8):
        a, b, c, d, e, f, g, h = [vars8[..., i] for i in range(8)]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        temp1 = h + S1 + ch + k[t] + w[..., t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        temp2 = S0 + maj
        return jnp.stack(
            [temp1 + temp2, a, b, c, d + temp1, e, f, g], axis=-1
        )

    out = jax.lax.fori_loop(0, 64, round_step, state)
    return state + out


def sha256_blocks(blocks: jnp.ndarray, n_active: jnp.ndarray) -> jnp.ndarray:
    """blocks: (B, n_blocks, 16) uint32 big-endian words; n_active: (B,)
    number of blocks actually part of each lane's (padded) message.
    Returns digests (B, 8) uint32."""
    B, n_blocks, _ = blocks.shape
    # `+ blocks*0` ties the initial state's sharding type to the inputs so
    # the fori_loop carry typechecks under shard_map
    state = jnp.broadcast_to(jnp.asarray(_H0), (B, 8)) + blocks[:, 0, :8] * 0

    def body(i, st):
        new = _compress_block(st, blocks[:, i, :])
        keep = (i < n_active)[:, None]
        return jnp.where(keep, new, st)

    return jax.lax.fori_loop(0, n_blocks, body, state)


sha256_blocks_jit = jax.jit(sha256_blocks)


# ---------------------------------------------------------------------------
# Host-side packing helpers
# ---------------------------------------------------------------------------


def pad_messages(msgs: list[bytes], n_blocks: int | None = None):
    """SHA-256-pad each message; returns (blocks (B, n_blocks, 16) uint32,
    n_active (B,) int32)."""
    padded = []
    for m in msgs:
        bitlen = len(m) * 8
        p = m + b"\x80"
        while (len(p) + 8) % 64:
            p += b"\x00"
        p += bitlen.to_bytes(8, "big")
        padded.append(p)
    max_blocks = max(len(p) // 64 for p in padded)
    if n_blocks is None:
        n_blocks = max_blocks
    assert n_blocks >= max_blocks
    B = len(msgs)
    blocks = np.zeros((B, n_blocks, 16), dtype=np.uint32)
    n_active = np.zeros((B,), dtype=np.int32)
    for i, p in enumerate(padded):
        nb = len(p) // 64
        n_active[i] = nb
        arr = np.frombuffer(p, dtype=">u4").reshape(nb, 16)
        blocks[i, :nb] = arr
    return jnp.asarray(blocks), jnp.asarray(n_active)


def digests_to_bytes(digests) -> list[bytes]:
    arr = np.asarray(digests).astype(">u4")
    return [arr[i].tobytes() for i in range(arr.shape[0])]


def sha256_many(msgs: list[bytes], n_blocks: int | None = None) -> list[bytes]:
    """Convenience: hash a batch of byte strings on device."""
    blocks, n_active = pad_messages(msgs, n_blocks)
    return digests_to_bytes(sha256_blocks_jit(blocks, n_active))
