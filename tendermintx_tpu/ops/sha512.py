"""Batched SHA-512 (uint32-pair words) — the Ed25519 challenge hash.

Witness-side equivalent of the SHA-512 used inside the reference's EdDSA
STARK gadget (SURVEY.md N6: `curta_eddsa_verify_sigs_conditional` hashes
R ‖ A ‖ M with SHA-512). 64-bit words are (lo, hi) uint32 pairs since TPU
vector units are 32-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_K = [
    0x428A2F98D728AE22, 0x7137449123EF65CD, 0xB5C0FBCFEC4D3B2F, 0xE9B5DBA58189DBBC,
    0x3956C25BF348B538, 0x59F111F1B605D019, 0x923F82A4AF194F9B, 0xAB1C5ED5DA6D8118,
    0xD807AA98A3030242, 0x12835B0145706FBE, 0x243185BE4EE4B28C, 0x550C7DC3D5FFB4E2,
    0x72BE5D74F27B896F, 0x80DEB1FE3B1696B1, 0x9BDC06A725C71235, 0xC19BF174CF692694,
    0xE49B69C19EF14AD2, 0xEFBE4786384F25E3, 0x0FC19DC68B8CD5B5, 0x240CA1CC77AC9C65,
    0x2DE92C6F592B0275, 0x4A7484AA6EA6E483, 0x5CB0A9DCBD41FBD4, 0x76F988DA831153B5,
    0x983E5152EE66DFAB, 0xA831C66D2DB43210, 0xB00327C898FB213F, 0xBF597FC7BEEF0EE4,
    0xC6E00BF33DA88FC2, 0xD5A79147930AA725, 0x06CA6351E003826F, 0x142929670A0E6E70,
    0x27B70A8546D22FFC, 0x2E1B21385C26C926, 0x4D2C6DFC5AC42AED, 0x53380D139D95B3DF,
    0x650A73548BAF63DE, 0x766A0ABB3C77B2A8, 0x81C2C92E47EDAEE6, 0x92722C851482353B,
    0xA2BFE8A14CF10364, 0xA81A664BBC423001, 0xC24B8B70D0F89791, 0xC76C51A30654BE30,
    0xD192E819D6EF5218, 0xD69906245565A910, 0xF40E35855771202A, 0x106AA07032BBD1B8,
    0x19A4C116B8D2D0C8, 0x1E376C085141AB53, 0x2748774CDF8EEB99, 0x34B0BCB5E19B48A8,
    0x391C0CB3C5C95A63, 0x4ED8AA4AE3418ACB, 0x5B9CCA4F7763E373, 0x682E6FF3D6B2B8A3,
    0x748F82EE5DEFB2FC, 0x78A5636F43172F60, 0x84C87814A1F0AB72, 0x8CC702081A6439EC,
    0x90BEFFFA23631E28, 0xA4506CEBDE82BDE9, 0xBEF9A3F7B2C67915, 0xC67178F2E372532B,
    0xCA273ECEEA26619C, 0xD186B8C721C0C207, 0xEADA7DD6CDE0EB1E, 0xF57D4F7FEE6ED178,
    0x06F067AA72176FBA, 0x0A637DC5A2C898A6, 0x113F9804BEF90DAE, 0x1B710B35131C471B,
    0x28DB77F523047D84, 0x32CAAB7B40C72493, 0x3C9EBE0A15C9BEBC, 0x431D67C49C100D4C,
    0x4CC5D4BECB3E42B6, 0x597F299CFC657E2A, 0x5FCB6FAB3AD6FAEC, 0x6C44198C4A475817,
]
_K_LO = np.array([k & 0xFFFFFFFF for k in _K], dtype=np.uint32)
_K_HI = np.array([k >> 32 for k in _K], dtype=np.uint32)

_H0 = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F, 0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]
_H0_LO = np.array([h & 0xFFFFFFFF for h in _H0], dtype=np.uint32)
_H0_HI = np.array([h >> 32 for h in _H0], dtype=np.uint32)


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def _rotr64(x, n):
    lo, hi = x
    if n == 32:
        return hi, lo
    if n < 32:
        return (
            (lo >> n) | (hi << (32 - n)),
            (hi >> n) | (lo << (32 - n)),
        )
    m = n - 32
    return (
        (hi >> m) | (lo << (32 - m)),
        (lo >> m) | (hi << (32 - m)),
    )


def _shr64(x, n):
    lo, hi = x
    if n < 32:
        return (lo >> n) | (hi << (32 - n)), hi >> n
    return hi >> (n - 32), jnp.zeros_like(hi)


def _xor(*xs):
    lo = xs[0][0]
    hi = xs[0][1]
    for x in xs[1:]:
        lo = lo ^ x[0]
        hi = hi ^ x[1]
    return lo, hi


def _compress_block(state_lo, state_hi, blk_lo, blk_hi):
    """state: (...,8)+(...,8); blk: (...,16)+(...,16). Returns new state."""
    k_lo = jnp.asarray(_K_LO)
    k_hi = jnp.asarray(_K_HI)

    def sched(t, w):
        w_lo, w_hi = w
        w15 = (w_lo[..., t - 15], w_hi[..., t - 15])
        w2 = (w_lo[..., t - 2], w_hi[..., t - 2])
        s0 = _xor(_rotr64(w15, 1), _rotr64(w15, 8), _shr64(w15, 7))
        s1 = _xor(_rotr64(w2, 19), _rotr64(w2, 61), _shr64(w2, 6))
        acc = _add64((w_lo[..., t - 16], w_hi[..., t - 16]), s0)
        acc = _add64(acc, (w_lo[..., t - 7], w_hi[..., t - 7]))
        acc = _add64(acc, s1)
        return w_lo.at[..., t].set(acc[0]), w_hi.at[..., t].set(acc[1])

    pad = jnp.zeros(blk_lo.shape[:-1] + (64,), jnp.uint32)
    w = (
        jnp.concatenate([blk_lo, pad], axis=-1),
        jnp.concatenate([blk_hi, pad], axis=-1),
    )
    w_lo, w_hi = jax.lax.fori_loop(16, 80, sched, w)

    def rnd(t, st):
        st_lo, st_hi = st
        v = lambda i: (st_lo[..., i], st_hi[..., i])
        a, b, c, d, e, f, g, h = [v(i) for i in range(8)]
        S1 = _xor(_rotr64(e, 14), _rotr64(e, 18), _rotr64(e, 41))
        ch = (
            (e[0] & f[0]) ^ (~e[0] & g[0]),
            (e[1] & f[1]) ^ (~e[1] & g[1]),
        )
        t1 = _add64(h, S1)
        t1 = _add64(t1, ch)
        t1 = _add64(t1, (k_lo[t], k_hi[t]))
        t1 = _add64(t1, (w_lo[..., t], w_hi[..., t]))
        S0 = _xor(_rotr64(a, 28), _rotr64(a, 34), _rotr64(a, 39))
        maj = (
            (a[0] & b[0]) ^ (a[0] & c[0]) ^ (b[0] & c[0]),
            (a[1] & b[1]) ^ (a[1] & c[1]) ^ (b[1] & c[1]),
        )
        t2 = _add64(S0, maj)
        new_a = _add64(t1, t2)
        new_e = _add64(d, t1)
        out_lo = jnp.stack(
            [new_a[0], a[0], b[0], c[0], new_e[0], e[0], f[0], g[0]], axis=-1
        )
        out_hi = jnp.stack(
            [new_a[1], a[1], b[1], c[1], new_e[1], e[1], f[1], g[1]], axis=-1
        )
        return out_lo, out_hi

    out_lo, out_hi = jax.lax.fori_loop(0, 80, rnd, (state_lo, state_hi))
    lo, hi = _add64((state_lo, state_hi), (out_lo, out_hi))
    return lo, hi


def sha512_blocks(blk_lo, blk_hi, n_active):
    """blk_*: (B, n_blocks, 16) uint32; n_active: (B,). -> (B,8),(B,8)."""
    B, n_blocks, _ = blk_lo.shape
    st_lo = jnp.broadcast_to(jnp.asarray(_H0_LO), (B, 8)) + blk_lo[:, 0, :8] * 0
    st_hi = jnp.broadcast_to(jnp.asarray(_H0_HI), (B, 8)) + blk_hi[:, 0, :8] * 0

    def body(i, st):
        lo, hi = _compress_block(st[0], st[1], blk_lo[:, i, :], blk_hi[:, i, :])
        keep = (i < n_active)[:, None]
        return jnp.where(keep, lo, st[0]), jnp.where(keep, hi, st[1])

    return jax.lax.fori_loop(0, n_blocks, body, (st_lo, st_hi))


sha512_blocks_jit = jax.jit(sha512_blocks)


def bytes_to_blocks512(data, byte_len, n_blocks: int):
    """SHA-512-pad byte lanes on device (128-byte blocks).

    data: (B, max_bytes) uint8 zero-right-padded; byte_len: (B,). Caller
    guarantees byte_len <= n_blocks*128 - 17 per lane. Returns
    (blk_lo, blk_hi (B, n_blocks, 16) uint32, n_active (B,))."""
    B, max_bytes = data.shape
    total = n_blocks * 128
    buf = jnp.zeros((B, total), jnp.uint8)
    buf = buf.at[:, :max_bytes].set(data)
    idx = jnp.arange(total)[None, :]
    buf = jnp.where(idx < byte_len[:, None], buf, 0).astype(jnp.uint8)
    buf = jnp.where(idx == byte_len[:, None], jnp.uint8(0x80), buf)
    n_active = (byte_len + 17 + 127) // 128
    bitlen = byte_len.astype(jnp.uint32) * 8
    # 16-byte big-endian length field; only the last 4 bytes can be nonzero
    last = n_active * 128 - 4
    for k in range(4):
        shift = 8 * (3 - k)
        byte_val = ((bitlen >> shift) & 0xFF).astype(jnp.uint8)
        buf = buf.at[jnp.arange(B), last + k].set(byte_val)
    b = buf.reshape(B, n_blocks, 16, 8).astype(jnp.uint32)
    hi = (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    lo = (b[..., 4] << 24) | (b[..., 5] << 16) | (b[..., 6] << 8) | b[..., 7]
    return lo, hi, n_active


def sha512_bytes_var(data, byte_len, n_blocks: int):
    """Variable-length SHA-512 of byte lanes -> ((B,8),(B,8)) word pairs."""
    blk_lo, blk_hi, n_active = bytes_to_blocks512(data, byte_len, n_blocks)
    return sha512_blocks(blk_lo, blk_hi, n_active)


def digest_words_to_bytes_dev(d_lo, d_hi):
    """(B,8)+(B,8) uint32 -> (B,64) uint8 big-endian digest bytes."""
    B = d_lo.shape[0]

    def split(x):
        return jnp.stack(
            [(x >> 24) & 0xFF, (x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF],
            axis=-1,
        )

    hi_b = split(d_hi)  # (B, 8, 4)
    lo_b = split(d_lo)
    return (
        jnp.concatenate([hi_b, lo_b], axis=-1).astype(jnp.uint8).reshape(B, 64)
    )


def pad_messages(msgs: list[bytes], n_blocks: int | None = None):
    """SHA-512-pad; returns (blk_lo, blk_hi (B,n_blocks,16) uint32, n_active)."""
    padded = []
    for m in msgs:
        bitlen = len(m) * 8
        p = m + b"\x80"
        while (len(p) + 16) % 128:
            p += b"\x00"
        p += bitlen.to_bytes(16, "big")
        padded.append(p)
    max_blocks = max(len(p) // 128 for p in padded)
    if n_blocks is None:
        n_blocks = max_blocks
    assert n_blocks >= max_blocks
    B = len(msgs)
    blk_lo = np.zeros((B, n_blocks, 16), dtype=np.uint32)
    blk_hi = np.zeros((B, n_blocks, 16), dtype=np.uint32)
    n_active = np.zeros((B,), dtype=np.int32)
    for i, p in enumerate(padded):
        nb = len(p) // 128
        n_active[i] = nb
        words = np.frombuffer(p, dtype=">u8").reshape(nb, 16)
        blk_lo[i, :nb] = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        blk_hi[i, :nb] = (words >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(blk_lo), jnp.asarray(blk_hi), jnp.asarray(n_active)


def digests_to_bytes(d_lo, d_hi) -> list[bytes]:
    lo = np.asarray(d_lo).astype(np.uint64)
    hi = np.asarray(d_hi).astype(np.uint64)
    words = (hi << np.uint64(32)) | lo
    return [words[i].astype(">u8").tobytes() for i in range(words.shape[0])]


def sha512_many(msgs: list[bytes], n_blocks: int | None = None) -> list[bytes]:
    blk_lo, blk_hi, n_active = pad_messages(msgs, n_blocks)
    d_lo, d_hi = sha512_blocks_jit(blk_lo, blk_hi, n_active)
    return digests_to_bytes(d_lo, d_hi)
