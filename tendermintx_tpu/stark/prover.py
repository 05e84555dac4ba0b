"""STARK prover: trace commit -> quotient -> DEEP composition -> FRI.

TPU-native re-design of the reference's proving pipeline (`circuit.prove()`,
/root/reference/circuits/step.rs:223 — externally plonky2's prover). The
structure is the standard DEEP-ALI STARK:

  1. Column-wise iNTT + coset LDE of the trace; Poseidon Merkle commit.
  2. Constraint evaluation over the whole LDE domain (vectorized, device).
  3. Quotient Q = sum_k alpha^k C_k / Z_k, split into degree-<n chunks,
     committed.
  4. Out-of-domain sampling at z: trace(z), trace(z*w), chunks(z).
  5. DEEP composition F(x) = sum beta^k (P_k(x) - P_k(z_k))/(x - z_k),
     low-degree-proved with FRI.

All device compute is jitted; transcript logic runs on host ints.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

import logging

from ..ops import ntt as nttmod
from ..ops.ext import GF2, ext_add, ext_inv, ext_mul, ext_pow, ext_sub
from ..ops.goldilocks import GF, P, MULTIPLICATIVE_GENERATOR, from_int_array
from ..ops.merkle import MerkleTree
from .air import Air, DeviceAlgebra, Frame, HostAlgebra, HostFelt
from .challenger import Challenger, DeviceChallenger
from .fri import FriConfig, FriProof, fri_prove

log = logging.getLogger(__name__)


@dataclass
class StarkConfig:
    rate_bits: int = 3
    n_queries: int = 32
    final_poly_len: int = 32
    proof_of_work_bits: int = 16
    shift: int = MULTIPLICATIVE_GENERATOR
    # Merkle cap height: commitments are the 2^min(cap_bits, depth) digests
    # at that depth; openings stop there (VERDICT r3 next-step #6).
    cap_bits: int = 4

    @property
    def fri(self) -> FriConfig:
        return FriConfig(
            rate_bits=self.rate_bits,
            n_queries=self.n_queries,
            final_poly_len=self.final_poly_len,
            proof_of_work_bits=self.proof_of_work_bits,
            cap_bits=self.cap_bits,
        )


@dataclass
class StarkProof:
    n_rows: int
    public_inputs: list[int]
    trace_cap: list[list[int]]
    quotient_cap: list[list[int]]
    # ood_trace[k][i]: column i evaluated at z * g^frame_offsets[k], over
    # [main ‖ aux] columns (n_cols + n_aux_cols entries per offset)
    ood_trace: list[list[tuple[int, int]]]
    ood_quotient: list[tuple[int, int]]
    fri_proof: FriProof
    # index -> (trace_row, trace_path, aux_row, aux_path, quot_row,
    # quot_path); aux_row/aux_path are [] when the AIR has no aux columns
    openings: dict
    # phase-2 commitment cap (None when the AIR has no aux columns)
    aux_cap: list[list[int]] | None = None


# ---------------------------------------------------------------------------
# Host-side domain tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _domain_points(log_N: int, shift: int) -> list[int]:
    N = 1 << log_N
    w = nttmod.primitive_root_of_unity(log_N)
    pts = [0] * N
    acc = shift % P
    for i in range(N):
        pts[i] = acc
        acc = acc * w % P
    return pts


@lru_cache(maxsize=None)
def _domain_points_limbs(log_N: int, shift: int):
    return from_int_array(np.array(_domain_points(log_N, shift), dtype=object))


@lru_cache(maxsize=None)
def _deep_invs_fn(log_N: int):
    """Jitted (x - z_g)^-1 over the whole LDE domain for every opening
    group: the host Montgomery-batch loop this replaces ran ~N * n_offsets
    big-int muls per proof (~7 s at N=65536) on the critical path."""

    @jax.jit
    def f(pts: GF, zk0: GF, zk1: GF) -> GF2:
        # pts (N,); zk0/zk1 (k,) ext components of the opening points
        k = zk0.shape[0]
        N = pts.lo.shape[0]
        c0 = GF(pts.lo[None, :], pts.hi[None, :]).broadcast_to((k, N)) - GF(
            jnp.broadcast_to(zk0.lo[:, None], (k, N)),
            jnp.broadcast_to(zk0.hi[:, None], (k, N)),
        )
        nz1 = -zk1
        c1 = GF(
            jnp.broadcast_to(nz1.lo[:, None], (k, N)),
            jnp.broadcast_to(nz1.hi[:, None], (k, N)),
        )
        return GF2(c0, c1).inv()

    return f


def _batch_inverse(vals: list[int]) -> list[int]:
    """Montgomery batch inversion over Python ints."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % P
    inv_all = pow(prefix[n], P - 2, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % P
        inv_all = inv_all * vals[i] % P
    return out


def deep_power_layout(
    n_cols: int, n_aux: int, n_chunks: int, n_offsets: int
) -> tuple[list[int], int, list[int]]:
    """Beta-power exponent layout for the DEEP combination.

    Sections are padded so every Merkle leaf row (trace / aux / quotient,
    zero-padded to the sponge RATE by ops/merkle.py) occupies a whole
    number of 8-felt absorb chunks: trace columns sit at exponents
    [0, pad8(n_cols)), aux at [pad8(n_cols), S), quotient chunks (ext
    values = 2 base felts each, 4 per absorb chunk) at ext exponents
    [S, S + pad4(n_chunks)), and offset group g multiplies the shared row
    Horner by beta^{base_g}. Padding exponents multiply zeros (the padded
    lanes), so the combination stays a per-power-distinct linear code.

    Returns (group base exponents, chunk base exponent, combined-row
    position map pos[i])."""
    PT = -(-n_cols // 8) * 8
    PA = -(-n_aux // 8) * 8
    PQ = -(-max(n_chunks, 1) // 4) * 4
    S = PT + PA
    bases = [0] + [S + PQ + (g - 1) * S for g in range(1, n_offsets)]
    pos = [i if i < n_cols else PT + (i - n_cols) for i in range(n_cols + n_aux)]
    return bases, S, pos


def _beta_powers(beta: tuple[int, int], count: int) -> list[tuple[int, int]]:
    out = [(1, 0)]
    for _ in range(count - 1):
        out.append(ext_mul(out[-1], beta))
    return out


def periodic_interpolant(pattern: tuple[int, ...]) -> list[int]:
    """Coefficients of the degree-<p interpolant r of a period-p pattern on
    the size-p subgroup (host iNTT)."""
    from .fri import _intt_ints

    return _intt_ints([v % P for v in pattern])


@lru_cache(maxsize=None)
def _periodic_lde(pattern: tuple[int, ...], log_n: int, rate_bits: int, shift: int):
    """Evaluations of r(x^(n/p)) over the LDE domain, as numpy limb pairs.

    x^(n/p) over the coset shift*<w_N> cycles with period p * 2^rate_bits:
    those are exactly the coset-LDE evals of the interpolant over
    shift^(n/p) * <w_cycle> (root conventions agree: w_N^(n/p) = w_cycle),
    computed on device and tiled."""
    p = len(pattern)
    assert p & (p - 1) == 0, "periodic pattern length must be a power of two"
    n = 1 << log_n
    assert n % p == 0
    coeffs = periodic_interpolant(pattern)
    N = n << rate_bits
    cycle = p << rate_bits
    s_pow = pow(shift, n // p, P)
    cg = GF.from_ints(np.array([coeffs], dtype=object))
    ev = _chunk_lde_fn(rate_bits, s_pow)(cg).to_ints()[0]
    reps = N // cycle
    full = np.tile(np.array([int(v) for v in ev], dtype=object), reps)
    return from_int_array(full)


@lru_cache(maxsize=None)
def _zerofier_inverses(log_n: int, rate_bits: int, shift: int):
    """Returns numpy limb pairs of per-point zerofier-inverse evals on the LDE
    domain: (transition, first, last, cyclic)."""
    n = 1 << log_n
    log_N = log_n + rate_bits
    N = 1 << log_N
    pts = _domain_points(log_N, shift)
    g_last = pow(nttmod.primitive_root_of_unity(log_n), n - 1, P)

    # 1/(x^n - 1): periodic with period 2^rate_bits
    blow = 1 << rate_bits
    zh_vals = [(pow(pts[i], n, P) - 1) % P for i in range(blow)]
    zh_inv = _batch_inverse(zh_vals)
    zh_inv_full = [zh_inv[i % blow] for i in range(N)]
    # transition: (x - g_last) / (x^n - 1)
    trans = [(pts[i] - g_last) % P * zh_inv_full[i] % P for i in range(N)]
    first = _batch_inverse([(pts[i] - 1) % P for i in range(N)])
    last = _batch_inverse([(pts[i] - g_last) % P for i in range(N)])

    to_np = lambda v: from_int_array(np.array(v, dtype=object))
    return to_np(trans), to_np(first), to_np(last), to_np(zh_inv_full)


def _np_gf(pair) -> GF:
    return GF(jnp.asarray(pair[0]), jnp.asarray(pair[1]))


def _ext_scalar(v: tuple[int, int], shape=(1,)) -> GF2:
    def g(c):
        return GF(
            jnp.full(shape, np.uint32(c & 0xFFFFFFFF), jnp.uint32),
            jnp.full(shape, np.uint32(c >> 32), jnp.uint32),
        )

    return GF2(g(v[0] % P), g(v[1] % P))


def _ext_scale_base(beta: tuple[int, int], x: GF) -> GF2:
    """beta (ext const) * x (base field array) -> GF2 array."""
    b = _ext_scalar(beta, (1,))
    c0 = x * b.c0.broadcast_to(x.shape)
    c1 = x * b.c1.broadcast_to(x.shape)
    return GF2(c0, c1)


# ---------------------------------------------------------------------------
# Device kernels (jitted per shape)
# ---------------------------------------------------------------------------


# Compiled-function cache. Key: (type(air), air.cache_key(), shape params).
# Air subclasses whose constraints depend on constructor state beyond
# (n_cols, n_public, frame_offsets) must override cache_key().
_FN_CACHE: dict = {}


def _air_cache_key(air):
    custom = getattr(air, "cache_key", None)
    extra = custom() if callable(custom) else ()
    return (
        type(air),
        air.n_cols,
        air.n_public,
        tuple(air.frame_offsets),
        air.constraint_degree,
        air.n_aux_cols,
        air.n_challenges,
        extra,
    )


def _quotient_fn(air, log_n: int, rate_bits: int, shift: int):
    key = ("quot", _air_cache_key(air), log_n, rate_bits, shift)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    fn = _build_quotient_fn(air, log_n, rate_bits)
    _FN_CACHE[key] = fn
    return fn


# The materialized frame (n_offsets * n_total * block) is capped around
# 2^27 elements (~1 GB lo+hi): wide AIRs at large N (the B=128 Ed25519
# statement's 2-offset, ~2750-column, 2^18-row LDE) would otherwise
# materialize an 11+ GB rolled view and OOM the 16 GB chip. Blocks are
# processed sequentially through ONE compiled program (start is traced).
_QUOTIENT_BLOCK_ELEMS = 1 << 27


def _build_quotient_fn(air, log_n: int, rate_bits: int):
    """Constraint-quotient evaluation for one AIR shape on the single-chip
    path: (trace LDE, aux LDE | None, alpha powers, publics,
    periodic/public columns, zerofier inverses) -> Q evals over the LDE
    domain. Compiled once per AIR/shape; eager evaluation of wide
    constraint systems costs ~100x more in dispatch than the math itself.
    Large frames stream in row blocks (see _QUOTIENT_BLOCK_ELEMS)."""
    n = 1 << log_n
    N = n << rate_bits
    blowup = 1 << rate_bits
    offsets = list(air.frame_offsets)
    n_total = air.n_cols + air.n_aux_cols

    frame_elems = len(offsets) * n_total * N
    n_blocks = 1
    while frame_elems // n_blocks > _QUOTIENT_BLOCK_ELEMS and N // n_blocks > 4096:
        n_blocks *= 2
    B = N // n_blocks

    def full(trace_lde: GF, aux_lde, alpha_pows, pub, periodic, public_cols, zinvs, chal: GF):
        # all offsets at once: (n_offsets, n_total, N) rolled views
        lde = (
            GF.concatenate([trace_lde, aux_lde], axis=0)
            if aux_lde is not None
            else trace_lde
        )
        stacked = GF(
            jnp.stack([jnp.roll(lde.lo, -k * blowup, axis=1) for k in offsets]),
            jnp.stack([jnp.roll(lde.hi, -k * blowup, axis=1) for k in offsets]),
        )
        return _eval_quotient_core(
            air, stacked, alpha_pows, pub, periodic, public_cols, zinvs, chal, N
        )

    def gather_block(lde: GF, start):
        base = start + jnp.arange(B, dtype=jnp.uint32)
        los, his = [], []
        for k in offsets:
            idx = (base + jnp.uint32(k * blowup)) % jnp.uint32(N)
            los.append(lde.lo[:, idx])
            his.append(lde.hi[:, idx])
        return GF(jnp.stack(los), jnp.stack(his))

    def block(trace_lde: GF, aux_lde, alpha_pows, pub, periodic, public_cols, zinvs, chal: GF, start):
        st = gather_block(trace_lde, start)
        if aux_lde is not None:
            st = GF.concatenate([st, gather_block(aux_lde, start)], axis=1)

        def sl(x: GF) -> GF:
            return GF(
                jax.lax.dynamic_slice_in_dim(x.lo, start, B, axis=0),
                jax.lax.dynamic_slice_in_dim(x.hi, start, B, axis=0),
            )

        return _eval_quotient_core(
            air, st, alpha_pows, pub,
            tuple(sl(p) for p in periodic),
            tuple(sl(p) for p in public_cols),
            tuple(sl(z) for z in zinvs),
            chal, B,
        )

    full_j = jax.jit(full)
    block_j = jax.jit(block)

    def f(trace_lde, aux_lde, alpha_pows, pub, periodic, public_cols, zinvs, chal):
        if n_blocks == 1:
            return full_j(
                trace_lde, aux_lde, alpha_pows, pub, periodic, public_cols,
                zinvs, chal,
            )
        parts = [
            block_j(
                trace_lde, aux_lde, alpha_pows, pub, periodic, public_cols,
                zinvs, chal, jnp.uint32(bi * B),
            )
            for bi in range(n_blocks)
        ]
        return GF2(
            GF.concatenate([p.c0 for p in parts], axis=0),
            GF.concatenate([p.c1 for p in parts], axis=0),
        )

    return f


def _eval_quotient_core(
    air, stacked: GF, alpha_pows: GF2, pub: GF, periodic, public_cols, zinvs, chal: GF, N: int
):
    """Constraint quotient from pre-gathered frame views. `stacked` is
    (n_offsets, n_cols + n_aux, N_block) — the single-chip path builds it
    with jnp.roll over the full domain; the sharded path (parallel/
    prover.py) with a ppermute halo exchange over a row-sharded block."""
    n_cols = air.n_cols + air.n_aux_cols
    rows = [
        [GF(stacked.lo[ki, i], stacked.hi[ki, i]) for i in range(n_cols)]
        for ki in range(len(air.frame_offsets))
    ]
    alg = DeviceAlgebra(N)
    pub_felts = [pub[i : i + 1] for i in range(pub.shape[0])]
    chal_felts = [chal[i : i + 1] for i in range(chal.shape[0])]
    frame = Frame(
        rows=rows,
        public=pub_felts,
        periodic=list(periodic),
        public_cols=list(public_cols),
        rows_stacked=stacked,
        challenges=chal_felts,
    )
    groups = [
        (air.eval_first(frame, alg), zinvs[0]),
        (air.eval_transition(frame, alg), zinvs[1]),
        (air.eval_cyclic(frame, alg), zinvs[2]),
        (air.eval_last(frame, alg), zinvs[3]),
    ]
    # Vectorized combination: stack each group's constraints to (Kg, N),
    # one wide mul by its zerofier inverse, then a single alpha-weighted
    # reduction over all K constraints (the naive per-constraint loop
    # costs ~600 wide field ops and dominates compile time).
    def to_block(c):
        return c if c.lo.ndim == 2 else GF(c.lo[None], c.hi[None])

    czi_parts = []
    for constraints, zi in groups:
        if not constraints:
            continue
        cstack = GF.concatenate([to_block(c) for c in constraints], axis=0)
        zi_b = GF(zi.lo[None, :], zi.hi[None, :])
        czi_parts.append(cstack * zi_b)
    all_czi = GF.concatenate(czi_parts, axis=0)  # (K, N)
    a_lo = GF(alpha_pows.c0.lo[:, None], alpha_pows.c0.hi[:, None])
    a_hi = GF(alpha_pows.c1.lo[:, None], alpha_pows.c1.hi[:, None])
    return GF2((a_lo * all_czi).sum(axis=0), (a_hi * all_czi).sum(axis=0))


def _deep_compose_fn(air, log_n: int, rate_bits: int):
    key = ("deep", _air_cache_key(air), log_n, rate_bits)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    fn = _build_deep_fn(air, log_n, rate_bits)
    _FN_CACHE[key] = fn
    return fn


# Cap on the (columns x block) working set of one DEEP block: the
# beta-weighted column sum's field-mul temporaries are full
# (n_cols, block) u32 arrays, ~13 of them live at the peak (XLA does not
# fuse the broadcast-multiply chain into the reduction), so the
# uncapped B=128 Ed25519 statement's DEEP program wanted 25.8 GB of HBM.
_DEEP_BLOCK_ELEMS = 1 << 25


def _build_deep_fn(air, log_n: int, rate_bits: int):
    """Jitted DEEP composition: per opening group, G(x) = sum_i beta_i T_i(x)
    (+ chunks in group 0), F = sum_g (G - G0_g) * inv(x - z_g). Takes the
    trace and aux LDEs as separate parts (single-chip path — the combined
    matrix would be a full extra copy of the dominant allocation), and
    streams row blocks when the working set exceeds _DEEP_BLOCK_ELEMS
    (pointwise in x, so blocking is exact)."""
    n_main = air.n_cols
    n_total = n_main + air.n_aux_cols
    n_offsets = len(air.frame_offsets)
    N = 1 << (log_n + rate_bits)

    n_blocks = 1
    while (n_total * N) // n_blocks > _DEEP_BLOCK_ELEMS and N // n_blocks > 4096:
        n_blocks *= 2
    B = N // n_blocks

    def core(trace_lde: GF, aux_lde, chunks: GF2, betas_t: GF2, betas_q: GF2, g0s: GF2, invs: GF2, nb: int):
        F = GF2.zeros((nb,))
        for gi in range(n_offsets):
            bc0 = betas_t.c0[gi][:n_main, None].broadcast_to((n_main, nb))
            bc1 = betas_t.c1[gi][:n_main, None].broadcast_to((n_main, nb))
            G = GF2(
                (bc0 * trace_lde).sum(axis=0), (bc1 * trace_lde).sum(axis=0)
            )
            if aux_lde is not None:
                n_aux = aux_lde.shape[0]
                ac0 = betas_t.c0[gi][n_main:, None].broadcast_to((n_aux, nb))
                ac1 = betas_t.c1[gi][n_main:, None].broadcast_to((n_aux, nb))
                G = G + GF2(
                    (ac0 * aux_lde).sum(axis=0), (ac1 * aux_lde).sum(axis=0)
                )
            if gi == 0:
                n_chunks = chunks.shape[0]
                qb = GF2(
                    betas_q.c0[:, None].broadcast_to((n_chunks, nb)),
                    betas_q.c1[:, None].broadcast_to((n_chunks, nb)),
                )
                G = G + (qb * chunks).sum(axis=0)
            g0 = g0s[gi]
            G = G - GF2(g0.c0.broadcast_to((nb,)), g0.c1.broadcast_to((nb,)))
            F = F + G * GF2(invs.c0[gi], invs.c1[gi])
        return F

    def full(trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs):
        return core(trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs, N)

    def sl2(x, start, size):
        return jax.lax.dynamic_slice_in_dim(x, start, size, axis=-1)

    def block(trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs, start):
        tb = GF(sl2(trace_lde.lo, start, B), sl2(trace_lde.hi, start, B))
        ab = (
            GF(sl2(aux_lde.lo, start, B), sl2(aux_lde.hi, start, B))
            if aux_lde is not None
            else None
        )
        cb = GF2(
            GF(sl2(chunks.c0.lo, start, B), sl2(chunks.c0.hi, start, B)),
            GF(sl2(chunks.c1.lo, start, B), sl2(chunks.c1.hi, start, B)),
        )
        ib = GF2(
            GF(sl2(invs.c0.lo, start, B), sl2(invs.c0.hi, start, B)),
            GF(sl2(invs.c1.lo, start, B), sl2(invs.c1.hi, start, B)),
        )
        return core(tb, ab, cb, betas_t, betas_q, g0s, ib, B)

    full_j = jax.jit(full)
    block_j = jax.jit(block)

    def f(trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs):
        if n_blocks == 1:
            return full_j(trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs)
        parts = [
            block_j(
                trace_lde, aux_lde, chunks, betas_t, betas_q, g0s, invs,
                jnp.uint32(bi * B),
            )
            for bi in range(n_blocks)
        ]
        return GF2(
            GF.concatenate([p.c0 for p in parts], axis=0),
            GF.concatenate([p.c1 for p in parts], axis=0),
        )

    return f


def _deep_core(
    trace_lde: GF, chunks: GF2, betas_t: GF2, betas_q: GF2, g0s: GF2, invs: GF2,
    n_cols: int, n_offsets: int, N: int,
):
    """DEEP composition over an LDE block (pointwise in the domain, so the
    sharded prover calls it per row-shard).
    trace_lde: (n_cols, N); chunks: (n_chunks, N) ext;
    betas_t: (n_offsets, n_cols) ext; betas_q: (n_chunks,) ext;
    g0s: (n_offsets,) ext; invs: (n_offsets, N) ext."""
    F = GF2.zeros((N,))
    for gi in range(n_offsets):
        # ext-scalar-per-column times base columns, summed over columns
        bc0 = betas_t.c0[gi][:, None].broadcast_to((n_cols, N))
        bc1 = betas_t.c1[gi][:, None].broadcast_to((n_cols, N))
        G = GF2((bc0 * trace_lde).sum(axis=0), (bc1 * trace_lde).sum(axis=0))
        if gi == 0:
            n_chunks = chunks.shape[0]
            qb = GF2(
                betas_q.c0[:, None].broadcast_to((n_chunks, N)),
                betas_q.c1[:, None].broadcast_to((n_chunks, N)),
            )
            G = G + (qb * chunks).sum(axis=0)
        g0 = g0s[gi]
        G = G - GF2(g0.c0.broadcast_to((N,)), g0.c1.broadcast_to((N,)))
        F = F + G * invs[gi]
    return F


from functools import partial


@partial(jax.jit, static_argnums=1)
def _zpowers_fn(z: GF2, n: int):
    """[z^0 .. z^(n-1)] as a GF2 (n,) array (device scan)."""
    lo0 = jnp.zeros((n,), jnp.uint32).at[0].set(1)
    zero = jnp.zeros((n,), jnp.uint32)
    acc = GF2(GF(lo0, zero), GF(zero, zero))

    def body(i, acc):
        prev = GF2(
            GF(acc.c0.lo[i - 1], acc.c0.hi[i - 1]),
            GF(acc.c1.lo[i - 1], acc.c1.hi[i - 1]),
        )
        cur = prev * GF2(
            GF(z.c0.lo[0], z.c0.hi[0]), GF(z.c1.lo[0], z.c1.hi[0])
        )
        return GF2(
            GF(acc.c0.lo.at[i].set(cur.c0.lo), acc.c0.hi.at[i].set(cur.c0.hi)),
            GF(acc.c1.lo.at[i].set(cur.c1.lo), acc.c1.hi.at[i].set(cur.c1.hi)),
        )

    return jax.lax.fori_loop(1, n, body, acc)


@jax.jit
def _ood_trace_fn(trace_coeffs: GF, zpow: GF2, gk: GF):
    """OOD evals on device: T_i(z * g^k) for every column i and offset k.

    trace_coeffs: (C, n); zpow: (n,) powers of z; gk: (n_offsets, n) with
    gk[k][j] = g^(k*j), so T_i(z g^k) = sum_j (c_ij * gk[k][j]) * z^j.
    Returns GF2 with shape (n_offsets, C)."""
    n_off = gk.lo.shape[0]
    outs = []
    for k in range(n_off):
        row = GF(gk.lo[k][None, :], gk.hi[k][None, :])
        scaled = trace_coeffs * row  # (C, n)
        c0 = (scaled * GF(zpow.c0.lo[None, :], zpow.c0.hi[None, :])).sum(axis=-1)
        c1 = (scaled * GF(zpow.c1.lo[None, :], zpow.c1.hi[None, :])).sum(axis=-1)
        outs.append(GF2(c0, c1))
    return GF2.stack(outs, axis=0)


@jax.jit
def _ood_ext_fn(coeffs: GF2, zpow: GF2):
    """Evaluate ext-coefficient polys (rows) at z: coeffs (K, n) -> (K,)."""
    zp = GF2(
        GF(zpow.c0.lo[None, :], zpow.c0.hi[None, :]),
        GF(zpow.c1.lo[None, :], zpow.c1.hi[None, :]),
    )
    prod = coeffs * zp
    return prod.sum(axis=-1)


@lru_cache(maxsize=None)
def _gk_table(log_n: int, offsets: tuple[int, ...]):
    """gk[k][j] = g^(offsets[k] * j) host table as numpy limb pairs."""
    n = 1 << log_n
    g = nttmod.primitive_root_of_unity(log_n)
    rows = []
    for k in offsets:
        base = pow(g, k, P)
        acc = 1
        row = []
        for _ in range(n):
            row.append(acc)
            acc = acc * base % P
        rows.append(row)
    return from_int_array(np.array(rows, dtype=object))


@lru_cache(maxsize=None)
def _chunk_lde_fn(rate_bits: int, shift: int):
    @jax.jit
    def f(coeffs: GF):
        return nttmod.coset_lde(coeffs, rate_bits, shift)

    return f


@lru_cache(maxsize=None)
def _trace_lde_fn(rate_bits: int, shift: int):
    @jax.jit
    def f(cols: GF):
        coeffs = nttmod.intt(cols)
        lde = nttmod.coset_lde(coeffs, rate_bits, shift)
        return coeffs, lde

    return f


@lru_cache(maxsize=None)
def _coset_intt_fn(shift: int):
    @jax.jit
    def f(evals_c0: GF, evals_c1: GF):
        n = evals_c0.shape[-1]
        sinv = pow(shift, P - 2, P)
        powers = _np_gf(nttmod._power_table(sinv, n))
        c0 = nttmod.intt(evals_c0) * powers
        c1 = nttmod.intt(evals_c1) * powers
        return c0, c1

    return f


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


@dataclass
class _StmtCtx:
    """Everything a committed statement needs after FRI query sampling:
    the trees + device matrices for openings gathering. The single-chip
    path keeps COLUMN-major matrices (trace_cols etc. — the layout the
    LDE/quotient/DEEP already use; a row-major duplicate doubled resident
    HBM and OOMed the 16 GB chip at N=128); the mesh path keeps its
    row-sharded row matrices."""

    air: Air
    n: int
    N: int
    trace_tree: MerkleTree
    aux_tree: MerkleTree | None
    quot_tree: MerkleTree
    trace_cap: list
    aux_cap: list | None
    quot_cap: list
    cap_bits: int
    trace_rows: GF | None
    aux_rows: GF | None
    quot_rows: GF | None
    ood_trace: list
    ood_quotient: list
    public_inputs: list[int]
    trace_cols: GF | None = None
    aux_cols: GF | None = None
    quot_cols: GF | None = None


def _prove_statement(
    air: Air,
    trace_cols: GF,
    public_inputs: list[int],
    config: StarkConfig,
    challenger: Challenger,
    mesh=None,
    shift: int | None = None,
):
    """Steps 1-5 of the DEEP-ALI pipeline for ONE statement, driven by a
    caller-owned transcript: observe publics, commit trace/aux/quotient,
    OOD, and return (_StmtCtx, F) where F is the DEEP composition codeword
    over this statement's LDE domain. `prove` runs one statement and FRIs
    its F directly; `batch.prove_batch` runs several against a shared
    challenger and folds all the Fs into a single FRI (stark/batch.py)."""
    n_cols, n = int(trace_cols.shape[0]), int(trace_cols.shape[1])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    rate_bits = config.rate_bits
    N = n << rate_bits
    blowup = 1 << rate_bits
    if shift is None:
        shift = config.shift

    # Per-phase timers (the reference's RUST_LOG=debug proof-time logging,
    # SURVEY.md §5): logged at DEBUG, one summary line at INFO.
    import time as _time

    _phases: list[tuple[str, float]] = []
    _t0 = _time.perf_counter()

    def _mark(label: str):
        nonlocal _t0
        now = _time.perf_counter()
        _phases.append((label, now - _t0))
        log.debug("prove[%s n=%d]: %s %.2fs", type(air).__name__, n, label, now - _t0)
        _t0 = now

    challenger.observe_elements(public_inputs)
    # Commit-phase transcript runs ON DEVICE (stark/challenger.py
    # DeviceChallenger): caps are absorbed and challenges sampled as device
    # scalars so none of the three commitments blocks on a host fetch —
    # everything is fetched ONCE with the OOD values, then the host
    # challenger is replayed over the fetched caps and cross-checked.
    # Through the remote-TPU relay each blocking cap fetch costs ~0.7 s;
    # three per statement across three statements was ~6 s of the N=128
    # composite's serial time.
    dc = DeviceChallenger(challenger)

    # Sharded-phase functions (memoized per AIR shape + mesh).
    if mesh is not None:
        from ..parallel import prover as shp

        def _shfn(tag, builder):
            key = (tag, _air_cache_key(air), log_n, rate_bits, shift, mesh)
            if key not in _FN_CACHE:
                _FN_CACHE[key] = builder()
            return _FN_CACHE[key]

        lde_fn = _shfn("slde", lambda: shp.sharded_trace_lde(mesh, rate_bits, shift))
        leaf_fn = _shfn("sleaf", lambda: shp.sharded_leaf_hashes(mesh))
        quotient_fn = _shfn(
            "squot", lambda: shp.sharded_quotient_fn(mesh, air, log_n, rate_bits)
        )
        deep_fn = _shfn(
            "sdeep", lambda: shp.sharded_deep_fn(mesh, air, log_n, rate_bits)
        )
    else:
        lde_fn = _trace_lde_fn(rate_bits, shift)
        leaf_fn = None
        quotient_fn = _quotient_fn(air, log_n, rate_bits, shift)
        deep_fn = _deep_compose_fn(air, log_n, rate_bits)

    # 1. Trace LDE + commit. Merkle leaves are LDE rows; the single-chip
    #    path hashes them straight from the column-major LDE
    #    (MerkleTree.build_cols — no (N, n_cols) transposed duplicate).
    trace_coeffs, trace_lde = lde_fn(trace_cols)
    if leaf_fn is None:
        trace_rows = None
        trace_tree = MerkleTree.build_cols(trace_lde)
    else:
        trace_rows = GF(
            jnp.transpose(trace_lde.lo), jnp.transpose(trace_lde.hi)
        )  # (N, n_cols)
        trace_tree = MerkleTree.build(trace_rows, leaf_fn=leaf_fn)
    trace_cap_dev = trace_tree.cap_dev(config.cap_bits)
    ch_dev = dc.observe_rows_sample(trace_cap_dev, 2 * air.n_challenges)
    _mark("trace-lde+commit")

    # 1b. Phase-2 (auxiliary) commitment: sample challenges from the
    #     transcript, derive aux columns (lookup/permutation witnesses),
    #     commit them separately.
    n_aux = air.n_aux_cols
    if n_aux:
        # aux_columns implementations dispatch a handful of jitted kernels
        # (see lookup.build_aux) — NOT one fused jit program, which trips
        # XLA:CPU pathologies, and NOT thousands of eager primitives,
        # which cost minutes through the remote-TPU relay. Challenges are
        # passed as device scalars so the kernels don't retrace per proof.
        ch_traced = [
            GF2(
                GF(ch_dev.lo[2 * i : 2 * i + 1], ch_dev.hi[2 * i : 2 * i + 1]),
                GF(
                    ch_dev.lo[2 * i + 1 : 2 * i + 2],
                    ch_dev.hi[2 * i + 1 : 2 * i + 2],
                ),
            )
            for i in range(air.n_challenges)
        ]
        aux_cols = air.aux_columns(trace_cols, ch_traced, list(public_inputs))
        assert tuple(aux_cols.shape) == (n_aux, n), aux_cols.shape
        aux_coeffs, aux_lde = lde_fn(aux_cols)
        if leaf_fn is None:
            aux_rows = None
            aux_tree = MerkleTree.build_cols(aux_lde)
        else:
            aux_rows = GF(jnp.transpose(aux_lde.lo), jnp.transpose(aux_lde.hi))
            aux_tree = MerkleTree.build(aux_rows, leaf_fn=leaf_fn)
        aux_cap_dev = aux_tree.cap_dev(config.cap_bits)
        alpha_dev = dc.observe_rows_sample(aux_cap_dev, 2)
        _mark("aux-columns+commit")
        # single-chip: NEVER concatenate the LDEs (the concat is a full
        # extra copy of the statement's dominant allocation; the quotient
        # and DEEP kernels take the parts). Mesh path keeps the combined
        # matrix its sharded kernels expect. Coefficients are n/N-th the
        # size — the concat there is cheap and OOD wants one matrix.
        all_lde = (
            GF.concatenate([trace_lde, aux_lde], axis=0)
            if mesh is not None
            else None
        )
        all_coeffs = GF.concatenate([trace_coeffs, aux_coeffs], axis=0)
    else:
        aux_tree = None
        aux_cap_dev = None
        aux_rows = None
        aux_lde = None
        all_lde = trace_lde if mesh is not None else None
        all_coeffs = trace_coeffs
        alpha_dev = dc.sample_many(2)
    n_total = n_cols + n_aux

    # 2. Constraint evaluation on the LDE domain (one jitted program).
    offsets = list(air.frame_offsets)
    assert offsets[0] == 0, "frame_offsets must start with 0"
    n_constraints = air.n_constraints
    alpha_gf2 = GF2(
        GF(alpha_dev.lo[0:1], alpha_dev.hi[0:1]),
        GF(alpha_dev.lo[1:2], alpha_dev.hi[1:2]),
    )
    alpha_pows = _zpowers_fn(alpha_gf2, n_constraints)  # device scan
    pub_gf = GF.from_ints(np.array([v % P for v in public_inputs], dtype=object)) \
        if public_inputs else GF.zeros((0,))
    periodic = tuple(
        _np_gf(_periodic_lde(tuple(p), log_n, rate_bits, shift))
        for p in air.periodic_columns()
    )
    pcols = air.public_columns(list(public_inputs), n)
    if pcols:
        # ONE batched LDE for all public columns (the recursive wrapper has
        # ~70 schedule columns; per-column dispatches each pay the remote
        # relay's launch latency)
        assert all(len(col) == n for col in pcols)
        arr = np.zeros((len(pcols), n), dtype=np.uint64)
        for i, col in enumerate(pcols):
            if isinstance(col, np.ndarray):  # already reduced (evalair)
                arr[i] = col
            else:
                arr[i] = [v % P for v in col]
        pc_gf = GF(
            jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((arr >> np.uint64(32)).astype(np.uint32)),
        )
        _, pc_lde = _trace_lde_fn(rate_bits, shift)(pc_gf)
        public_cols = tuple(pc_lde[i] for i in range(len(pcols)))
    else:
        public_cols = ()

    tz, fz, lz, cz = _zerofier_inverses(log_n, rate_bits, shift)
    zinvs = (_np_gf(fz), _np_gf(tz), _np_gf(cz), _np_gf(lz))

    chal_gf = ch_dev  # (2 * n_challenges,) interleaved [c0, c1] per challenge
    if mesh is None:
        q_evals = quotient_fn(
            trace_lde, aux_lde if n_aux else None, alpha_pows, pub_gf,
            periodic, public_cols, zinvs, chal_gf,
        )
    else:
        q_evals = quotient_fn(
            all_lde, alpha_pows, pub_gf, periodic, public_cols, zinvs, chal_gf
        )

    # 3. Quotient -> coefficients -> split into degree-<n chunks -> commit.
    qc0, qc1 = _coset_intt_fn(shift)(q_evals.c0, q_evals.c1)
    n_chunks = air.constraint_degree - 1
    assert n_chunks * n <= N, "rate too low for constraint degree"
    chunk_coeffs = []  # list of GF2 coeff vectors, length n
    for j in range(n_chunks):
        chunk_coeffs.append(GF2(qc0[j * n : (j + 1) * n], qc1[j * n : (j + 1) * n]))
    # (Degree check happens implicitly: the verifier's OOD identity fails if
    # Q had coefficients beyond n_chunks * n.)

    # Batched jitted chunk LDE (an eager per-chunk loop pays ~ms/primitive
    # dispatch overhead, which dominates for high-degree AIRs).
    chunk_stack = GF.stack(
        [x for ch in chunk_coeffs for x in (ch.c0, ch.c1)], axis=0
    )  # (2*n_chunks, n)
    chunk_lde_all = _chunk_lde_fn(rate_bits, shift)(chunk_stack)
    chunk_ldes = [
        GF2(chunk_lde_all[2 * j], chunk_lde_all[2 * j + 1]) for j in range(n_chunks)
    ]
    if leaf_fn is None:
        # chunk_lde_all's rows are exactly the quotient leaf-row columns
        # ([c0_0, c1_0, c0_1, ...]) — commit column-major, no transpose
        quot_rows = None
        quot_tree = MerkleTree.build_cols(chunk_lde_all)
    else:
        quot_rows = GF.stack(
            [x for ch in chunk_ldes for x in (ch.c0, ch.c1)], axis=-1
        )  # (N, 2*n_chunks)
        quot_tree = MerkleTree.build(quot_rows, leaf_fn=leaf_fn)
    quot_cap_dev = quot_tree.cap_dev(config.cap_bits)
    z_dev = dc.observe_rows_sample(quot_cap_dev, 2)
    _mark("quotient+commit")

    # 4. OOD evaluations at z * g^k for every frame offset k (device).
    g_trace = nttmod.primitive_root_of_unity(log_n)
    z_gf2 = GF2(
        GF(z_dev.lo[0:1], z_dev.hi[0:1]), GF(z_dev.lo[1:2], z_dev.hi[1:2])
    )
    zpow = _zpowers_fn(z_gf2, n)
    gk = _np_gf(_gk_table(log_n, tuple(offsets)))
    ood_dev = _ood_trace_fn(all_coeffs, zpow, gk)  # (n_offsets, n_total)
    chunk_ext = GF2(
        GF(chunk_stack.lo[0::2], chunk_stack.hi[0::2]),
        GF(chunk_stack.lo[1::2], chunk_stack.hi[1::2]),
    )
    oq_dev = _ood_ext_fn(chunk_ext, zpow)
    from ..ops.goldilocks import fetch_ints_many as _fetch_many

    # ONE relay round-trip for the whole statement: all three caps, every
    # device-sampled challenge (cross-checked below) and the OOD values.
    fetched = _fetch_many(
        [trace_cap_dev]
        + ([aux_cap_dev] if n_aux else [])
        + [quot_cap_dev, ch_dev, alpha_dev, z_dev]
        + [ood_dev.c0, ood_dev.c1, oq_dev.c0, oq_dev.c1]
    )
    fi = 0

    def _cap_ints(arr):
        return [[int(v) for v in row] for row in arr]

    def _check(vals, count):
        got = [challenger.sample_ext() for _ in range(count)]
        want = [
            (int(vals[2 * i]), int(vals[2 * i + 1])) for i in range(count)
        ]
        if got != want:
            raise RuntimeError(
                "device statement transcript diverged from host replay"
            )
        return got

    trace_cap = _cap_ints(fetched[fi]); fi += 1
    challenger.observe_cap(trace_cap)
    aux_cap = None
    if n_aux:
        aux_cap = _cap_ints(fetched[fi]); fi += 1
    quot_cap = _cap_ints(fetched[fi]); fi += 1
    _check(fetched[fi], air.n_challenges); fi += 1  # challenges
    if n_aux:
        challenger.observe_cap(aux_cap)
    _check(fetched[fi], 1); fi += 1  # alpha
    challenger.observe_cap(quot_cap)
    [z] = _check(fetched[fi], 1); fi += 1
    od_c0, od_c1, oq_c0, oq_c1 = fetched[fi : fi + 4]
    ood_trace = [
        [
            (int(od_c0[ki][i]), int(od_c1[ki][i]))
            for i in range(n_total)
        ]
        for ki in range(len(offsets))
    ]
    ood_quot = [(int(oq_c0[j]), int(oq_c1[j])) for j in range(n_chunks)]
    for per_offset in ood_trace:
        for v in per_offset:
            challenger.observe_ext(v)
    for v in ood_quot:
        challenger.observe_ext(v)
    _mark("ood")
    beta = challenger.sample_ext()

    # 5. DEEP composition over the LDE domain: one group per opening point.
    #    Group 0 (at z): trace cols + quotient chunks. Group k>0 (at z*g^k):
    #    trace cols. F = sum_g (G(x) - G(z_g)) / (x - z_g). Single jitted
    #    program; beta powers, OOD sums and denominator inverses are small
    #    host-side inputs.
    #
    #    Beta powers follow the PADDED section layout of deep_power_layout:
    #    group g's combination is beta^{base_g} * (one shared row Horner H)
    #    plus beta^{chunk_base} * (one chunk Horner Q) for group 0 — the
    #    algebraic shape the recursive wrapper AIR accumulates row by row
    #    (stark/recursion.py). Skipped (padding) powers multiply nothing.
    bases, chunk_base, pos = deep_power_layout(
        n_cols, n_aux, len(chunk_ldes), len(offsets)
    )
    pows = _beta_powers(beta, max(bases) + chunk_base + len(chunk_ldes) + 1)
    betas_t = []  # per offset, per col
    betas_q = []
    g0_list = []
    zk_list = []
    for gi, k in enumerate(offsets):
        zk_list.append(ext_mul(z, (pow(g_trace, k, P), 0)))
        row_betas = []
        G0 = (0, 0)
        for i in range(n_total):
            b_pow = pows[bases[gi] + pos[i]]
            row_betas.append(b_pow)
            G0 = ext_add(G0, ext_mul(b_pow, ood_trace[gi][i]))
        if gi == 0:
            for j in range(len(chunk_ldes)):
                b_pow = pows[chunk_base + j]
                betas_q.append(b_pow)
                G0 = ext_add(G0, ext_mul(b_pow, ood_quot[j]))
        betas_t.append(row_betas)
        g0_list.append(G0)

    betas_t_gf2 = GF2.stack([_ext_list_to_gf2(r) for r in betas_t], axis=0)
    betas_q_gf2 = _ext_list_to_gf2(betas_q)
    g0s_gf2 = _ext_list_to_gf2(g0_list)
    pts_lo, pts_hi = _domain_points_limbs(log_n + rate_bits, shift)
    zks = _ext_list_to_gf2(zk_list)
    invs_gf2 = _deep_invs_fn(log_n + rate_bits)(
        GF(jnp.asarray(pts_lo), jnp.asarray(pts_hi)), zks.c0, zks.c1
    )
    chunks_gf2 = GF2.stack(chunk_ldes, axis=0)  # (n_chunks, N)

    if mesh is None:
        F = deep_fn(
            trace_lde, aux_lde if n_aux else None, chunks_gf2,
            betas_t_gf2, betas_q_gf2, g0s_gf2, invs_gf2,
        )
    else:
        F = deep_fn(
            all_lde, chunks_gf2, betas_t_gf2, betas_q_gf2, g0s_gf2, invs_gf2
        )
    _mark("deep")

    ctx = _StmtCtx(
        air=air,
        n=n,
        N=N,
        trace_tree=trace_tree,
        aux_tree=aux_tree,
        quot_tree=quot_tree,
        trace_cap=trace_cap,
        aux_cap=aux_cap,
        quot_cap=quot_cap,
        cap_bits=config.cap_bits,
        trace_rows=trace_rows,
        aux_rows=aux_rows if n_aux else None,
        quot_rows=quot_rows,
        ood_trace=ood_trace,
        ood_quotient=ood_quot,
        public_inputs=list(public_inputs),
        trace_cols=trace_lde if mesh is None else None,
        aux_cols=(aux_lde if n_aux else None) if mesh is None else None,
        quot_cols=chunk_lde_all if mesh is None else None,
    )
    ctx.mark = _mark  # phase-timer continuation for the caller
    ctx.phases = _phases
    return ctx, F


def _statement_openings(ctx: _StmtCtx, indices) -> dict:
    """Openings at the given leaf indices: gather ONLY the queried rows on
    device and fetch those (the full row matrices are n_total * N field
    elements — full to_ints was the prover's host-transfer bottleneck)."""
    n_aux = ctx.air.n_aux_cols
    qs = sorted(set(int(q) for q in indices))
    qarr = jnp.asarray(qs)
    from ..ops.goldilocks import fetch_ints_many

    def rows_at(rows: GF | None, cols: GF | None) -> GF:
        if rows is not None:
            return rows[qarr]
        # column-major storage (single-chip): gather the queried columns
        # and transpose the tiny (n_cols, n_queries) result
        sel = GF(cols.lo[:, qarr], cols.hi[:, qarr])
        return GF(jnp.transpose(sel.lo), jnp.transpose(sel.hi))

    dev_arrs = [
        rows_at(ctx.trace_rows, ctx.trace_cols),
        rows_at(ctx.quot_rows, ctx.quot_cols),
    ]
    tg = ctx.trace_tree.sibling_gather(qs, ctx.cap_bits)
    qg = ctx.quot_tree.sibling_gather(qs, ctx.cap_bits)
    dev_arrs += [tg[0], qg[0]]
    if n_aux:
        ag = ctx.aux_tree.sibling_gather(qs, ctx.cap_bits)
        dev_arrs += [rows_at(ctx.aux_rows, ctx.aux_cols), ag[0]]
    fetched = fetch_ints_many(dev_arrs)  # ONE host fetch for all openings
    trace_sel, quot_sel = fetched[0], fetched[1]
    trace_paths = MerkleTree.decode_paths(fetched[2], tg[1], tg[2])
    quot_paths = MerkleTree.decode_paths(fetched[3], qg[1], qg[2])
    aux_sel = fetched[4] if n_aux else None
    aux_paths = (
        MerkleTree.decode_paths(fetched[5], ag[1], ag[2]) if n_aux else None
    )
    openings = {}
    for k_q, q in enumerate(qs):
        openings[q] = (
            trace_sel[k_q].tolist(),
            trace_paths[q],
            aux_sel[k_q].tolist() if n_aux else [],
            aux_paths[q] if n_aux else [],
            quot_sel[k_q].tolist(),
            quot_paths[q],
        )
    return openings


def prove(
    air: Air,
    trace_cols: GF,
    public_inputs: list[int],
    config: StarkConfig = StarkConfig(),
    transcript_seed: list[int] | None = None,
    mesh=None,
) -> StarkProof:
    """trace_cols: (n_cols, n_rows) GF on device (row i = step i of the
    computation). n_rows must be a power of two >= 4.

    transcript_seed: optional field elements absorbed before the public
    inputs — composite proofs chain their sub-proofs' transcripts through
    this (the verifier must supply the same seed).

    mesh: optional jax.sharding.Mesh — shards the LDEs (columns), the
    constraint quotient + DEEP composition (domain rows, ppermute halo),
    and Merkle leaf hashing across its devices (parallel/prover.py). The
    proof bytes are identical to the single-chip path."""
    challenger = Challenger()
    if transcript_seed:
        challenger.observe_elements(transcript_seed)
    ctx, F = _prove_statement(
        air, trace_cols, public_inputs, config, challenger, mesh=mesh
    )

    # 6. FRI low-degree proof (degree bound n on domain N).
    fri_proof = fri_prove(F, challenger, config.fri, config.shift, mesh=mesh)
    ctx.mark("fri")

    # 7. Openings at the FRI query indices.
    openings = _statement_openings(ctx, fri_proof.query_indices)
    ctx.mark("openings")
    log.info(
        "prove[%s n=%d N=%d cols=%d] %s total=%.2fs",
        type(air).__name__, ctx.n, ctx.N, air.n_cols + air.n_aux_cols,
        " ".join(f"{k}={v:.2f}" for k, v in ctx.phases),
        sum(v for _, v in ctx.phases),
    )

    return StarkProof(
        n_rows=ctx.n,
        public_inputs=list(public_inputs),
        trace_cap=ctx.trace_cap,
        quotient_cap=ctx.quot_cap,
        ood_trace=ctx.ood_trace,
        ood_quotient=ctx.ood_quotient,
        fri_proof=fri_proof,
        openings=openings,
        aux_cap=ctx.aux_cap,
    )


def _batch_ext_inv(vals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Batched GF(p^2) inversion: one base-field batch inversion of norms."""
    from ..ops.ext import W

    norms = [(v[0] * v[0] - W * v[1] * v[1]) % P for v in vals]
    ninvs = _batch_inverse(norms)
    return [
        (v[0] * ni % P, -v[1] * ni % P) for v, ni in zip(vals, ninvs)
    ]


@jax.jit
def _deep_term(G: GF2, G0: GF2, inv_xz: GF2) -> GF2:
    N = G.shape[0]
    g0 = GF2(G0.c0.broadcast_to((N,)), G0.c1.broadcast_to((N,)))
    return (G - g0) * inv_xz


def _broadcast_ext(v: tuple[int, int], n: int) -> GF2:
    return GF2(
        GF(
            jnp.full((n,), np.uint32(v[0] & 0xFFFFFFFF), jnp.uint32),
            jnp.full((n,), np.uint32(v[0] >> 32), jnp.uint32),
        ),
        GF(
            jnp.full((n,), np.uint32(v[1] & 0xFFFFFFFF), jnp.uint32),
            jnp.full((n,), np.uint32(v[1] >> 32), jnp.uint32),
        ),
    )


def _ext_list_to_gf2(vals: list[tuple[int, int]]) -> GF2:
    c0 = from_int_array(np.array([v[0] for v in vals], dtype=object))
    c1 = from_int_array(np.array([v[1] for v in vals], dtype=object))
    return GF2(GF(jnp.asarray(c0[0]), jnp.asarray(c0[1])), GF(jnp.asarray(c1[0]), jnp.asarray(c1[1])))


def _eval_base_poly_ext(coeffs: list[int], z: tuple[int, int]) -> tuple[int, int]:
    acc = (0, 0)
    for c in reversed(coeffs):
        acc = ext_add(ext_mul(acc, z), (c % P, 0))
    return acc


def _eval_ext_poly_ext(coeffs: list[tuple[int, int]], z: tuple[int, int]) -> tuple[int, int]:
    acc = (0, 0)
    for c in reversed(coeffs):
        acc = ext_add(ext_mul(acc, z), c)
    return acc
