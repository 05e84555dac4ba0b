"""LogUp lookup argument: batched range checks over the aux commitment.

TPU-native equivalent of starkyx's range-check tables (the reference's
Ed25519/SHA gadgets range-check their limbs against a 16-bit table inside
the STARK; SURVEY.md N6). We use the logarithmic-derivative formulation
(LogUp): for a random challenge γ sampled after the main trace commits,

    Σ_cells 1/(γ - v)  ==  Σ_rows m(row)/(γ - t(row))

holds iff every checked value v appears in the table column t with the
committed multiplicities m. Inverse sums are materialized as auxiliary
(phase-2) columns in the quadratic extension — each ext column is two base
columns — with `BATCH` checked values folded into one aux column:

    w · Π_i (γ - v_i) = Σ_j Π_{i≠j} (γ - v_i)        (degree BATCH + 1)
    wt · (γ - t_j) = m_j                              (degree 2)
    S = running sum of (Σ_b w_b - Σ_j wt_j); S(last) = 0

The table is the value range [0, 2^bits): when the trace is shorter than
the table, it is split column-major over `width` periodic columns
(t_j[i] = j·n + i), each with its own multiplicity column in the main
trace.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.ext import GF2, W
from ..ops.goldilocks import GF, P

BATCH = 4  # checked values per aux column -> constraint degree BATCH + 1


def _epair_add(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _epair_sub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _epair_mul(a, b, alg):
    # (a0 + a1 X)(b0 + b1 X) with X^2 = W
    return (
        a[0] * b[0] + alg.cmul(W, a[1] * b[1]),
        a[0] * b[1] + a[1] * b[0],
    )


@dataclass
class RangeLookup:
    """Range-check plumbing one AIR instance owns.

    checked_cols: main-trace column indices whose every row must lie in
    [0, 2^table_bits). mult_base: first of `width` multiplicity columns in
    the main trace (the AIR reserves them). aux_base: offset of this
    lookup's aux columns within the combined [main ‖ aux] frame (=
    n_cols + previously allocated aux)."""

    checked_cols: list[int]
    mult_base: int
    n_rows: int
    table_bits: int = 13
    aux_base: int = 0  # set by the AIR: absolute column index of aux[0]

    @property
    def table_size(self) -> int:
        return 1 << self.table_bits

    @property
    def width(self) -> int:
        return max(1, self.table_size // self.n_rows)

    @property
    def n_batches(self) -> int:
        return (len(self.checked_cols) + BATCH - 1) // BATCH

    @property
    def n_aux_ext(self) -> int:
        return self.n_batches + self.width + 1  # w's, wt's, S

    @property
    def n_aux_cols(self) -> int:
        return 2 * self.n_aux_ext

    # -- table ---------------------------------------------------------------

    def table_patterns(self) -> list[list[int]]:
        """Periodic table columns (length min(n_rows, table_size))."""
        span = min(self.n_rows, self.table_size)
        out = []
        for j in range(self.width):
            base = j * span
            if self.n_rows >= self.table_size:
                out.append([i % self.table_size for i in range(span)])
            else:
                out.append([base + i for i in range(span)])
        return out

    def _table_values(self) -> np.ndarray:
        """(width, n_rows) table values as the trace sees them."""
        out = np.zeros((self.width, self.n_rows), dtype=np.uint32)
        for j, pat in enumerate(self.table_patterns()):
            reps = self.n_rows // len(pat)
            out[j] = np.tile(np.asarray(pat, dtype=np.uint32), reps)
        return out

    def multiplicity_columns(self, checked_vals: np.ndarray) -> np.ndarray:
        """Count table hits: checked_vals (K, n_rows) uint; returns
        (width, n_rows) multiplicities to place in the main trace. Raises
        if any value is out of range (an honest prover never does)."""
        # stay in the trace's uint32 dtype: the int64 upcast of the
        # ~58M-element checked block was 5.3 s of the B=128 Ed25519 trace
        # generation (a third of the whole host wiring budget)
        vals = np.ascontiguousarray(checked_vals).ravel()
        if vals.size:
            if vals.dtype.kind != "u" and int(vals.min()) < 0:
                raise ValueError("range-check witness value out of table range")
            if int(vals.max()) >= self.table_size:
                raise ValueError("range-check witness value out of table range")
        counts = np.bincount(vals, minlength=self.table_size)
        out = np.zeros((self.width, self.n_rows), dtype=np.uint32)
        # each value's total count goes at its FIRST table occurrence; the
        # table layout is value v at (v // span, v % span) within the first
        # `span` rows, so the placement is one reshape
        span = min(self.n_rows, self.table_size)
        out[:, :span] = counts[: self.width * span].reshape(self.width, span)
        return out

    # -- prover: aux columns (device) -----------------------------------------

    def build_aux(self, trace: GF, gamma: tuple[int, int]) -> GF:
        """trace: (n_cols_main, n) GF on device. Returns (n_aux_cols, n).

        Orchestrates four module-level jitted kernels (w, wt, running sum,
        assembly). Deliberately NOT one fused jit program: compiling the
        whole derivation as one graph trips XLA:CPU pathologies (circular
        algebraic-simplifier rewrites on the scan network; producer
        duplication through the interleave/concat assembly) that make the
        executable orders of magnitude slower than its parts. Four
        dispatches keep every array on device — the remote-TPU relay cost
        is four launches instead of thousands of eager primitives.
        """
        import jax.numpy as jnp
        from .prover import _ext_scalar

        n = self.n_rows
        g = gamma if isinstance(gamma, GF2) else _ext_scalar(gamma, (1,))

        idx = list(self.checked_cols)
        checked = GF(trace.lo[jnp.asarray(idx)], trace.hi[jnp.asarray(idx)])
        K, nb = len(idx), self.n_batches
        pad = nb * BATCH - K
        if pad:
            # padding must contribute ZERO to the batch sum: pad cells get
            # denominator (γ - 0) but are excluded from the numerator (see
            # _aux_w_kernel)
            z = jnp.zeros((pad, n), checked.lo.dtype)
            checked = GF(
                jnp.concatenate([checked.lo, z]),
                jnp.concatenate([checked.hi, z]),
            )
        checked = GF(
            checked.lo.reshape(nb, BATCH, n), checked.hi.reshape(nb, BATCH, n)
        )
        w = _aux_w_kernel(checked, g, pad=pad)
        table = GF.from_u32(jnp.asarray(self._table_values()))  # (width, n)
        m_idx = [self.mult_base + j for j in range(self.width)]
        m = GF(trace.lo[jnp.asarray(m_idx)], trace.hi[jnp.asarray(m_idx)])
        wt = _aux_wt_kernel(table, m, g)
        S = _aux_scan_kernel(w, wt)
        return _aux_assemble_kernel(w, wt, S)

    # -- constraints -----------------------------------------------------------

    def _aux_pair(self, frame, offset_index: int, ext_idx: int):
        row = frame.rows[offset_index]
        base = self.aux_base + 2 * ext_idx
        return (row[base], row[base + 1])

    @property
    def _contiguous(self) -> bool:
        c = self.checked_cols
        return (
            len(c) % BATCH == 0
            and c == list(range(c[0], c[0] + len(c)))
        )

    def eval_lookup(self, frame, alg, periodic_base: int):
        """Cyclic + first/transition/last constraint pieces. Returns
        (cyclic, first, transition, last) lists; the AIR extends its own
        groups with them. periodic_base: index of the first table pattern
        within the AIR's periodic_columns().

        When the checked columns are contiguous and a multiple of BATCH,
        the batch constraints are emitted as stacked blocks (a handful of
        wide vector ops instead of thousands of scalar graphs)."""
        if self._contiguous:
            return self._eval_lookup_stacked(frame, alg, periodic_base)
        return self._eval_lookup_scalar(frame, alg, periodic_base)

    def _eval_lookup_stacked(self, frame, alg, periodic_base: int):
        g0, g1 = frame.challenges[0], frame.challenges[1]
        K = len(self.checked_cols)
        nb = self.n_batches
        v = alg.col_range(frame, 0, self.checked_cols[0], K)  # (K, N)
        d = (alg.vcmul(P - 1, v) + g0, alg.vcmul(0, v) + g1)  # γ - v, ext

        def evmul(a, b):
            return (
                a[0] * b[0] + alg.vcmul(W, a[1] * b[1]),
                a[0] * b[1] + a[1] * b[0],
            )

        def evadd(a, b):
            return (a[0] + b[0], a[1] + b[1])

        dk = [(d[0][k::BATCH], d[1][k::BATCH]) for k in range(BATCH)]
        p01 = evmul(dk[0], dk[1])
        p23 = evmul(dk[2], dk[3])
        total = evmul(p01, p23)
        numer = evadd(
            evmul(p23, evadd(dk[0], dk[1])), evmul(p01, evadd(dk[2], dk[3]))
        )
        wc = alg.col_range(frame, 0, self.aux_base, 2 * nb)
        w = (wc[0::2], wc[1::2])
        c = evmul(w, total)
        cyclic = [c[0] - numer[0], c[1] - numer[1]]  # two (nb, N) blocks
        cyclic.extend(self._table_constraints(frame, alg, periodic_base))
        first, transition, last = self._sum_constraints(frame, alg)
        return cyclic, first, transition, last

    def _table_constraints(self, frame, alg, periodic_base: int):
        from .air import DeviceAlgebra

        if isinstance(alg, DeviceAlgebra):
            return self._table_constraints_device(frame, alg, periodic_base)
        gamma = (frame.challenges[0], frame.challenges[1])
        zero_ = alg.const(0)
        out = []
        row0 = frame.rows[0]
        for j in range(self.width):
            t = frame.periodic[periodic_base + j]
            m = row0[self.mult_base + j]
            wt = self._aux_pair(frame, 0, self.n_batches + j)
            gm = (gamma[0] - t, gamma[1] - zero_)
            c = _epair_sub(_epair_mul(wt, gm, alg), (m, zero_))
            out.extend([c[0], c[1]])
        return out

    def _table_constraints_device(self, frame, alg, periodic_base: int):
        """Batched wt·(γ−t) − m over all `width` table columns at once.
        Emits ONE (2·width, N) block, rows interleaved (c0_j, c1_j) in j
        order — identical flatten order to the host loop."""
        import jax.numpy as jnp

        from ..ops.goldilocks import GF

        w, nb = self.width, self.n_batches
        g0, g1 = frame.challenges[0], frame.challenges[1]
        t = GF.stack(
            frame.periodic[periodic_base : periodic_base + w], axis=0
        )  # (w, N)
        m = alg.col_range(frame, 0, self.mult_base, w)
        allc = alg.col_range(frame, 0, self.aux_base + 2 * nb, 2 * w)
        wt0, wt1 = allc[0::2], allc[1::2]
        g0b = GF(g0.lo[None, :], g0.hi[None, :])
        g1b = GF(g1.lo[None, :], g1.hi[None, :])
        gm0 = g0b - t
        c0 = wt0 * gm0 + (wt1 * g1b).cmul(W) - m
        c1 = wt0 * g1b + wt1 * gm0
        inter_lo = jnp.stack([c0.lo, c1.lo], axis=1).reshape(2 * w, -1)
        inter_hi = jnp.stack([c0.hi, c1.hi], axis=1).reshape(2 * w, -1)
        return [GF(inter_lo, inter_hi)]

    def _sum_constraints(self, frame, alg):
        from .air import DeviceAlgebra

        if isinstance(alg, DeviceAlgebra):
            return self._sum_constraints_device(frame, alg)
        zero_ = alg.const(0)

        def diff_at(offset_index: int):
            d = (zero_, zero_)
            for b in range(self.n_batches):
                d = _epair_add(d, self._aux_pair(frame, offset_index, b))
            for j in range(self.width):
                d = _epair_sub(
                    d, self._aux_pair(frame, offset_index, self.n_batches + j)
                )
            return d

        S0 = self._aux_pair(frame, 0, self.n_batches + self.width)
        S1 = self._aux_pair(frame, 1, self.n_batches + self.width)
        first = list(_epair_sub(S0, diff_at(0)))
        transition = list(_epair_sub(_epair_sub(S1, S0), diff_at(1)))
        last = list(S0)
        return first, transition, last

    def _sum_constraints_device(self, frame, alg):
        """Batched running-sum constraints: the per-batch/per-table inverse
        columns are summed with strided slices + a fori-loop field sum
        instead of ~2(n_batches + width) scalar slice graphs."""
        nb, w = self.n_batches, self.width

        def diff_at(offset_index: int):
            allc = alg.col_range(
                frame, offset_index, self.aux_base, 2 * (nb + w)
            )  # interleaved (c0, c1) ext pairs: w's then wt's
            ws, ts = allc[: 2 * nb], allc[2 * nb :]
            return (
                ws[0::2].sum(axis=0) - ts[0::2].sum(axis=0),
                ws[1::2].sum(axis=0) - ts[1::2].sum(axis=0),
            )

        S0 = self._aux_pair(frame, 0, nb + w)
        S1 = self._aux_pair(frame, 1, nb + w)
        first = list(_epair_sub(S0, diff_at(0)))
        transition = list(_epair_sub(_epair_sub(S1, S0), diff_at(1)))
        last = list(S0)
        return first, transition, last

    def _eval_lookup_scalar(self, frame, alg, periodic_base: int):
        gamma = (frame.challenges[0], frame.challenges[1])
        one = alg.const(1)
        zero_ = alg.const(0)

        def gm(v):  # γ - v for base felt v
            return (gamma[0] - v, (gamma[1] - zero_))

        cyclic = []
        # batch constraints
        row0 = frame.rows[0]
        for b in range(self.n_batches):
            cols = self.checked_cols[b * BATCH : (b + 1) * BATCH]
            ds = [gm(row0[c]) for c in cols]
            # prefix/suffix products
            k = len(ds)
            pre = [(one, zero_)] * (k + 1)
            for i in range(k):
                pre[i + 1] = _epair_mul(pre[i], ds[i], alg)
            suf = [(one, zero_)] * (k + 1)
            for i in range(k - 1, -1, -1):
                suf[i] = _epair_mul(suf[i + 1], ds[i], alg)
            total = pre[k]
            numer = (zero_, zero_)
            for j in range(k):
                numer = _epair_add(numer, _epair_mul(pre[j], suf[j + 1], alg))
            w = self._aux_pair(frame, 0, b)
            c = _epair_sub(_epair_mul(w, total, alg), numer)
            cyclic.extend([c[0], c[1]])
        # table constraints
        for j in range(self.width):
            t = frame.periodic[periodic_base + j]
            m = row0[self.mult_base + j]
            wt = self._aux_pair(frame, 0, self.n_batches + j)
            c = _epair_sub(_epair_mul(wt, gm(t), alg), (m, zero_))
            cyclic.extend([c[0], c[1]])

        def diff_at(offset_index: int, frame_):
            d = (zero_, zero_)
            for b in range(self.n_batches):
                d = _epair_add(d, self._aux_pair(frame_, offset_index, b))
            for j in range(self.width):
                d = _epair_sub(
                    d, self._aux_pair(frame_, offset_index, self.n_batches + j)
                )
            return d

        S0 = self._aux_pair(frame, 0, self.n_batches + self.width)
        S1 = self._aux_pair(frame, 1, self.n_batches + self.width)
        d0 = diff_at(0, frame)
        d1 = diff_at(1, frame)
        first = list(_epair_sub(S0, d0))
        transition = list(_epair_sub(_epair_sub(S1, S0), d1))
        last = list(S0)
        return cyclic, first, transition, last

# -- jitted aux kernels (module level: one compiled program each; see
#    RangeLookup.build_aux for why they are not fused into one) -------------

from functools import partial as _partial

import jax as _jax
import jax.numpy as _jnp


def _gamma_minus(g: GF2, base_vals: GF) -> GF2:
    # (K, n) base -> ext (γ - v)
    return GF2(
        g.c0.broadcast_to(base_vals.shape) - base_vals,
        g.c1.broadcast_to(base_vals.shape),
    )


@_partial(_jax.jit, static_argnames=("pad",))
def _aux_w_kernel(checked: GF, g: GF2, pad: int) -> GF2:
    """checked: (nb, BATCH, n); returns w (nb, n) with w_b = Σ_i 1/(γ-v_i)
    via the closed form (Σ_i Π_{j≠i}) / Π_i — ONE inversion per batch
    instead of BATCH (inversion = ~64 muls, the dominant aux cost)."""
    nb = checked.shape[0]
    segs = [
        _gamma_minus(g, GF(checked.lo[:, k], checked.hi[:, k]))
        for k in range(BATCH)
    ]
    if pad:
        # Pad cells exist only in the LAST batch row: set their d to 1 (no
        # effect on products) and subtract their spurious numerator terms.
        one = GF2.ones(segs[0].shape)
        row_mask = _jnp.arange(nb)[:, None] == nb - 1
        for k in range(BATCH - pad, BATCH):
            segs[k] = GF2(
                GF(
                    _jnp.where(row_mask, one.c0.lo, segs[k].c0.lo),
                    _jnp.where(row_mask, one.c0.hi, segs[k].c0.hi),
                ),
                GF(
                    _jnp.where(row_mask, one.c1.lo, segs[k].c1.lo),
                    _jnp.where(row_mask, one.c1.hi, segs[k].c1.hi),
                ),
            )
    d0, d1, d2, d3 = segs
    p01 = d0 * d1
    p23 = d2 * d3
    denom = p01 * p23
    numer = p23 * (d0 + d1) + p01 * (d2 + d3)
    if pad:
        # each pad cell (d=1) contributed Π_{j≠i} = denom to the last
        # batch row's numerator; remove pad * denom there
        mask = (_jnp.arange(nb) == nb - 1).astype(_jnp.uint32)[:, None]
        sub = GF2(denom.c0.cmul(pad), denom.c1.cmul(pad))
        numer = numer - GF2(
            GF(sub.c0.lo * mask, sub.c0.hi * mask),
            GF(sub.c1.lo * mask, sub.c1.hi * mask),
        )
    return numer * denom.inv()


@_jax.jit
def _aux_wt_kernel(table: GF, m: GF, g: GF2) -> GF2:
    """wt_j = m_j / (γ - t_j): multiplicity-weighted table terms."""
    tdinv = _gamma_minus(g, table).inv()
    return GF2(tdinv.c0 * m, tdinv.c1 * m)


@_jax.jit
def _aux_scan_kernel(w: GF2, wt: GF2) -> GF2:
    """Running sum S[i] = Σ_{r<=i} (Σ_b w_b[r] - Σ_j wt_j[r]).

    Sequential lax.scan, NOT associative_scan: the log-depth slicing
    network of associative_scan over the field-add combinator sends
    XLA:CPU's algebraic simplifier into a circular-rewrite loop; the
    serial chain here is n field-adds, negligible."""
    diff = GF2(w.c0.sum(axis=0), w.c1.sum(axis=0)) - GF2(
        wt.c0.sum(axis=0), wt.c1.sum(axis=0)
    )

    def _step(carry, x):
        s = carry + x
        return s, s

    zero = GF2(
        GF(_jnp.zeros((), _jnp.uint32), _jnp.zeros((), _jnp.uint32)),
        GF(_jnp.zeros((), _jnp.uint32), _jnp.zeros((), _jnp.uint32)),
    )
    _, S = _jax.lax.scan(_step, zero, diff)
    return S


@_jax.jit
def _aux_assemble_kernel(w: GF2, wt: GF2, S: GF2) -> GF:
    def interleave(pair: GF2) -> GF:
        # (k, n) ext -> (2k, n) base rows [c0_0, c1_0, c0_1, ...]
        lo = _jnp.stack([pair.c0.lo, pair.c1.lo], axis=1)
        hi = _jnp.stack([pair.c0.hi, pair.c1.hi], axis=1)
        k = pair.c0.lo.shape[0]
        return GF(lo.reshape(2 * k, -1), hi.reshape(2 * k, -1))

    return GF.concatenate(
        [interleave(w), interleave(wt), GF.stack([S.c0, S.c1], axis=0)],
        axis=0,
    )

