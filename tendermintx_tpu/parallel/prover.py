"""Sharded STARK proving over a device mesh (SURVEY.md §2c axes 2-4).

The prover's heavy phases map onto a 1-D "lanes" mesh:

  * trace/aux/quotient LDE — COLUMN-sharded shard_map (each NTT is
    independent per column; no communication),
  * constraint quotient — ROW-sharded over the LDE domain: each chip
    evaluates all constraints on its block of domain points; multi-row
    frames read up to max_offset*blowup rows past the block end, fetched
    from the cyclic right neighbor with ONE lax.ppermute halo exchange
    over ICI,
  * DEEP composition — ROW-sharded (pointwise in the domain, no halo),
  * Merkle leaf hashing — ROW-sharded (one sponge per row).

The reference parallelizes the same phases across CPU cores with rayon
inside `circuit.prove()` (/root/reference — plonky2 via Cargo.lock:2957)
and has no multi-machine story; here the same proof bytes come out of a
`jax.sharding.Mesh`, so a v5e slice scales the prover where the reference
recompiles or waits.

All functions return the SAME values as their single-chip counterparts in
stark/prover.py — `prove(..., mesh=...)` produces byte-identical proofs.

Every shard_map here passes check_vma=False: the varying-manual-axes
static analysis walks the fully unrolled NTT/quotient graphs and costs
~80x the actual XLA compile (308 s vs 3.9 s for one trace LDE on a CPU
mesh). The out_specs are exercised by tests/test_sharding.py, which
asserts sharded proofs byte-identical to single-chip ones.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import ntt as nttmod
from ..ops import poseidon as ps
from ..ops.ext import GF2
from ..ops.goldilocks import GF


def _mesh_size(mesh) -> int:
    return int(mesh.devices.size)


def _axis(mesh) -> str:
    return mesh.axis_names[0]


def _pad_rows(x: GF, mult: int) -> tuple[GF, int]:
    """Pad axis 0 to a multiple of `mult` with zeros; returns (padded, orig)."""
    c = int(x.shape[0])
    extra = (-c) % mult
    if extra:
        z = jnp.zeros((extra,) + tuple(x.shape[1:]), x.lo.dtype)
        x = GF(jnp.concatenate([x.lo, z]), jnp.concatenate([x.hi, z]))
    return x, c


def sharded_trace_lde(mesh, rate_bits: int, shift: int):
    """Column-sharded (coeffs, lde) — the sharded analog of
    stark.prover._trace_lde_fn. Pads the column count to the mesh size."""
    D = _mesh_size(mesh)
    ax = _axis(mesh)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(ax, None),
        out_specs=(P(ax, None), P(ax, None)),
        check_vma=False,
    )
    def fn(cols: GF):
        coeffs = nttmod.intt(cols)
        lde = nttmod.coset_lde(coeffs, rate_bits, shift)
        return coeffs, lde

    # jit is load-bearing: an eager shard_map stages per call and costs
    # ~100x the jitted compile (382 s vs 3.9 s for this graph on CPU)
    fn = jax.jit(fn)

    def wrapped(cols: GF):
        padded, c = _pad_rows(cols, D)
        coeffs, lde = fn(padded)
        return coeffs[:c], lde[:c]

    return wrapped


def sharded_leaf_hashes(mesh):
    """Row-sharded Merkle leaf hashing: rows (n_leaves, width) -> (n, 4)."""
    ax = _axis(mesh)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(ax, None), out_specs=P(ax, None), check_vma=False)
    def fn(rows: GF) -> GF:
        return ps.hash_no_pad(rows)

    return jax.jit(fn)


def sharded_quotient_fn(mesh, air, log_n: int, rate_bits: int):
    """Row-sharded constraint quotient with a ppermute halo exchange.

    Device d holds LDE columns [d*Nb, (d+1)*Nb); frame offset k reads row
    x + k*blowup, so each device needs the first max_offset*blowup rows of
    its right (cyclic) neighbor — one ppermute of that halo slab replaces
    the single-chip jnp.roll."""
    from ..stark.prover import _eval_quotient_core

    D = _mesh_size(mesh)
    ax = _axis(mesh)
    n = 1 << log_n
    N = n << rate_bits
    blowup = 1 << rate_bits
    offsets = list(air.frame_offsets)
    halo = max(offsets) * blowup
    Nb = N // D
    assert halo <= Nb, "shard block smaller than the frame halo"
    # send my leading slab to my LEFT neighbor (it is their right halo)
    perm = [(i, (i - 1) % D) for i in range(D)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, ax),  # trace+aux LDE (C, N)
            P(None),      # alpha powers (replicated)
            P(None),      # publics
            P(ax),        # periodic LDEs (tuple of (N,))
            P(ax),        # public-column LDEs
            P(ax),        # zerofier inverses (4 x (N,))
            P(None),      # challenges
        ),
        out_specs=P(ax),
        check_vma=False,
    )
    def fn(lde_block, alpha_pows, pub, periodic, public_cols, zinvs, chal):
        if halo:
            lead_lo = jax.lax.ppermute(lde_block.lo[:, :halo], ax, perm)
            lead_hi = jax.lax.ppermute(lde_block.hi[:, :halo], ax, perm)
            ext_lo = jnp.concatenate([lde_block.lo, lead_lo], axis=1)
            ext_hi = jnp.concatenate([lde_block.hi, lead_hi], axis=1)
        else:
            ext_lo, ext_hi = lde_block.lo, lde_block.hi
        stacked = GF(
            jnp.stack(
                [ext_lo[:, k * blowup : k * blowup + Nb] for k in offsets]
            ),
            jnp.stack(
                [ext_hi[:, k * blowup : k * blowup + Nb] for k in offsets]
            ),
        )
        return _eval_quotient_core(
            air, stacked, alpha_pows, pub, periodic, public_cols, zinvs, chal, Nb
        )

    return jax.jit(fn)


def sharded_deep_fn(mesh, air, log_n: int, rate_bits: int):
    """Row-sharded DEEP composition (pointwise in the domain)."""
    from ..stark.prover import _deep_core

    ax = _axis(mesh)
    D = _mesh_size(mesh)
    n_cols = air.n_cols + air.n_aux_cols
    n_offsets = len(air.frame_offsets)
    N = 1 << (log_n + rate_bits)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, ax),  # trace+aux LDE
            P(None, ax),  # quotient chunk LDEs (ext)
            P(None),      # betas_t
            P(None),      # betas_q
            P(None),      # g0s
            P(None, ax),  # 1/(x - z_g) tables
        ),
        out_specs=P(ax),
        check_vma=False,
    )
    def fn(trace_lde, chunks, betas_t, betas_q, g0s, invs):
        return _deep_core(
            trace_lde, chunks, betas_t, betas_q, g0s, invs,
            n_cols, n_offsets, N // D,
        )

    return jax.jit(fn)


def sharded_fold_fn(mesh):
    """Row-sharded FRI fold (SURVEY §2c axis 4: FRI collectives over ICI).

    A fold pairs positions (i, i + N/2): with evals row-sharded over D
    devices, device d's OUTPUT block [d·N/2D, (d+1)·N/2D) needs the E half
    from (device d//2, local half d%2) and the O half from (device
    D/2 + d//2, same local half) — four partial ppermutes move exactly one
    N/2D-sized piece to every device, then the fold itself is local:

        out = (E + O)/2 + beta · (E - O) · (2x)^{-1}

    Same values as fri._fold_layer (proof bytes identical). Requires D
    even and N ≥ 2·D."""
    from ..ops.goldilocks import P as P_GOLD

    ax = _axis(mesh)
    D = _mesh_size(mesh)
    assert D % 2 == 0, "sharded fold needs an even mesh"
    inv2 = pow(2, P_GOLD - 2, P_GOLD)

    def _route(piece: GF, pairs) -> GF:
        return GF(
            jax.lax.ppermute(piece.lo, ax, pairs),
            jax.lax.ppermute(piece.hi, ax, pairs),
        )

    pe0 = [(s, 2 * s) for s in range(D // 2)]
    pe1 = [(s, 2 * s + 1) for s in range(D // 2)]
    po0 = [(s, 2 * (s - D // 2)) for s in range(D // 2, D)]
    po1 = [(s, 2 * (s - D // 2) + 1) for s in range(D // 2, D)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(None)),
        out_specs=P(ax),
        check_vma=False,
    )
    def fn(evals: GF2, invx: GF, beta: GF2) -> GF2:
        half = evals.shape[0] // 2
        h0 = evals[:half]
        h1 = evals[half:]
        odd = (jax.lax.axis_index(ax) % 2 == 1)

        def pick(a: GF2, b: GF2) -> GF2:
            return GF2(
                GF(
                    jnp.where(odd, b.c0.lo, a.c0.lo),
                    jnp.where(odd, b.c0.hi, a.c0.hi),
                ),
                GF(
                    jnp.where(odd, b.c1.lo, a.c1.lo),
                    jnp.where(odd, b.c1.hi, a.c1.hi),
                ),
            )

        e = pick(
            GF2(_route(h0.c0, pe0), _route(h0.c1, pe0)),
            GF2(_route(h1.c0, pe1), _route(h1.c1, pe1)),
        )
        o = pick(
            GF2(_route(h0.c0, po0), _route(h0.c1, po0)),
            GF2(_route(h1.c0, po1), _route(h1.c1, po1)),
        )
        s = e + o
        d_ = e - o
        s_half = GF2(s.c0.cmul(inv2), s.c1.cmul(inv2))
        d_scaled = GF2(d_.c0 * invx, d_.c1 * invx)
        nloc = s_half.c0.shape[0]
        beta_b = GF2(
            beta.c0.broadcast_to((nloc,)), beta.c1.broadcast_to((nloc,))
        )
        return s_half + (beta_b * d_scaled)

    return jax.jit(fn)


def sharded_ntt_fn(mesh, log_n: int):
    """Intra-NTT all-to-all (SURVEY §2c axis 3): one length-2^log_n NTT
    sharded across the mesh via the four-step (Bailey) decomposition.

    With N = R·C, R = D devices, coefficients row-major x[r·C + c]:

        A[p, c] = DFT_R over r of x[·C + c]          (cross-device dim)
        B[p, c] = A[p, c] · w_N^{p·c}                (twiddle)
        X[q·R + p] = DFT_C over c of B[p, ·] at q    (in-device dim)

    Three all_to_alls move the data so each DFT is local: columns to
    devices for DFT_R, rows back for DFT_C, and a final transpose into
    natural output order. Matches ops/ntt.ntt exactly (same values, same
    order) — this is the communication pattern that scales a SINGLE
    polynomial column beyond one chip's memory; for columns that fit one
    chip the embarrassingly-parallel per-column sharding in
    sharded_trace_lde is faster (no collectives)."""
    from ..ops.goldilocks import from_int_array, P as P_GOLD

    ax = _axis(mesh)
    D = _mesh_size(mesh)
    N = 1 << log_n
    C = N // D
    assert C % D == 0, "need N >= D^2 for the four-step layout"
    w = nttmod.primitive_root_of_unity(log_n)
    # tw[p, c] = w^(p*c), sharded over c
    import numpy as np

    rows = []
    for p in range(D):
        base = pow(w, p, P_GOLD)
        acc = 1
        row = [0] * C
        for c in range(C):
            row[c] = acc
            acc = acc * base % P_GOLD
        rows.append(row)
    tw_lo, tw_hi = from_int_array(np.array(rows, dtype=object))

    def _a2a(x: GF, split: int, concat: int) -> GF:
        # tiled=True: plain split-D/concat source-major semantics (the
        # non-tiled form interleaves received chunks element-wise)
        return GF(
            jax.lax.all_to_all(x.lo, ax, split, concat, tiled=True),
            jax.lax.all_to_all(x.hi, ax, split, concat, tiled=True),
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ax), P(None, ax)),
        out_specs=P(ax),
        check_vma=False,
    )
    def fn(x: GF, tw: GF) -> GF:
        # x local: (C,) = row r = my device index
        blk = x.reshape(D, C // D)
        cols = _a2a(blk, 0, 0)  # (D, C/D): all rows r, my c-chunk
        # DFT_R along axis 0
        a = nttmod.ntt(GF(cols.lo.T, cols.hi.T))  # (C/D, D) over r
        a = GF(a.lo.T, a.hi.T)  # (D, C/D): [p, c_loc]
        b = a * tw  # twiddle w^(p*c), tw sharded to my c-chunk
        rows_p = _a2a(b, 0, 1)  # (1, C)? -> row p = my index, all c
        rows_p = rows_p.reshape(C)
        f = nttmod.ntt(rows_p)  # (C,) over q, natural
        # final transpose to natural k = q*R + p order
        out = _a2a(f.reshape(D, C // D), 0, 0)  # (D, C/D): [p, q_loc]
        out = GF(out.lo.T, out.hi.T)  # (C/D, D): [q_loc, p]
        return out.reshape(C)

    def wrapped(coeffs: GF) -> GF:
        return fn(coeffs, GF(jnp.asarray(tw_lo), jnp.asarray(tw_hi)))

    return jax.jit(wrapped)
