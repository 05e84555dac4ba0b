"""Number-theoretic transform (NTT) and low-degree extension over Goldilocks.

TPU-native equivalent of the reference's plonky2 polynomial backend (LDE/FRI
inputs; SURVEY.md N3, consumed inside `circuit.prove()` at
/root/reference/circuits/step.rs:223). Radix-2 iterative Cooley-Tukey with
per-stage vectorized butterflies; twiddles precomputed host-side. Goldilocks
has 2-adicity 32, generator 7.

Shapes: transforms act on the LAST axis; leading axes are batch (e.g. trace
columns), so one call transforms a whole trace.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .goldilocks import GF, P, MULTIPLICATIVE_GENERATOR, from_int_array

# ---------------------------------------------------------------------------
# Host-side root/twiddle tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def primitive_root_of_unity(log_n: int) -> int:
    assert 0 <= log_n <= 32
    return pow(MULTIPLICATIVE_GENERATOR, (P - 1) >> log_n, P)


@lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables (numpy uint32 limb pairs), stage s has 2^s."""
    n = 1 << log_n
    w = primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    tables = []
    for s in range(log_n):
        m = 1 << s  # half-size of butterfly group at this stage
        step = n // (2 * m)
        tw = [pow(w, j * step, P) for j in range(m)]
        tables.append(from_int_array(np.array(tw, dtype=object)))
    return tables


@lru_cache(maxsize=None)
def _n_inv(log_n: int):
    n = 1 << log_n
    return from_int_array(np.array([pow(n, P - 2, P)], dtype=object))


@lru_cache(maxsize=None)
def _power_table(base: int, count: int):
    """[base^0, base^1, ..., base^(count-1)] as numpy limb pairs."""
    vals = []
    acc = 1
    for _ in range(count):
        vals.append(acc)
        acc = acc * base % P
    return from_int_array(np.array(vals, dtype=object))


def _gf_const(np_pair) -> GF:
    lo, hi = np_pair
    return GF(jnp.asarray(lo), jnp.asarray(hi))


# ---------------------------------------------------------------------------
# Device transforms
# ---------------------------------------------------------------------------


def ntt(x: GF) -> GF:
    """Forward NTT on the last axis (size must be a power of two).

    Input: coefficients c_0..c_{n-1}. Output: evaluations
    [p(w^0), p(w^1), ..., p(w^{n-1})] in natural order.
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return x
    rev = _bit_reverse_perm(log_n)
    x = GF(jnp.take(x.lo, rev, axis=-1), jnp.take(x.hi, rev, axis=-1))
    tables = _stage_twiddles(log_n, inverse=False)
    batch = x.shape[:-1]
    for s in range(log_n):
        m = 1 << s
        groups = n // (2 * m)
        tw = _gf_const(tables[s])  # (m,)
        v = x.reshape(*batch, groups, 2, m)
        e = v[..., 0, :]
        o = v[..., 1, :] * tw
        lo = jnp.concatenate([(e + o).lo[..., None, :], (e - o).lo[..., None, :]], axis=-2)
        hi = jnp.concatenate([(e + o).hi[..., None, :], (e - o).hi[..., None, :]], axis=-2)
        x = GF(lo, hi).reshape(*batch, n)
    return x


def intt(x: GF) -> GF:
    """Inverse NTT on the last axis: evaluations -> coefficients."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    rev = _bit_reverse_perm(log_n)
    x = GF(jnp.take(x.lo, rev, axis=-1), jnp.take(x.hi, rev, axis=-1))
    tables = _stage_twiddles(log_n, inverse=True)
    batch = x.shape[:-1]
    for s in range(log_n):
        m = 1 << s
        groups = n // (2 * m)
        tw = _gf_const(tables[s])
        v = x.reshape(*batch, groups, 2, m)
        e = v[..., 0, :]
        o = v[..., 1, :] * tw
        lo = jnp.concatenate([(e + o).lo[..., None, :], (e - o).lo[..., None, :]], axis=-2)
        hi = jnp.concatenate([(e + o).hi[..., None, :], (e - o).hi[..., None, :]], axis=-2)
        x = GF(lo, hi).reshape(*batch, n)
    ninv = _gf_const(_n_inv(log_n))
    return x * ninv.broadcast_to(x.shape)


def coset_lde(coeffs: GF, rate_bits: int, shift: int = MULTIPLICATIVE_GENERATOR) -> GF:
    """Low-degree extension: coefficients (deg < n on last axis) -> evals on
    the coset shift * <w_N> with N = n * 2^rate_bits, natural order."""
    n = coeffs.shape[-1]
    N = n << rate_bits
    # scale coefficients by shift^i, then zero-pad to N and NTT
    powers = _gf_const(_power_table(shift, n))
    scaled = coeffs * powers.broadcast_to(coeffs.shape)
    pad = GF.zeros(coeffs.shape[:-1] + (N - n,))
    return ntt(GF.concatenate([scaled, pad], axis=-1))


# ---------------------------------------------------------------------------
# Host oracle (tests / verifier)
# ---------------------------------------------------------------------------


def ntt_ints(coeffs: list[int]) -> list[int]:
    """O(n log n) recursive NTT on Python ints (natural-order output)."""
    n = len(coeffs)
    if n == 1:
        return list(coeffs)
    w = primitive_root_of_unity(n.bit_length() - 1)
    even = ntt_ints(coeffs[0::2])
    odd = ntt_ints(coeffs[1::2])
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = wk * odd[k] % P
        out[k] = (even[k] + t) % P
        out[k + n // 2] = (even[k] - t) % P
        wk = wk * w % P
    return out


def eval_poly_ints(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc
