"""AIR (algebraic intermediate representation) abstraction.

TPU-native equivalent of the reference's constraint-system layer (SURVEY.md
N4: plonky2's Plonk/AIR gates consumed via `Circuit::define`,
/root/reference/circuits/step.rs:104-127). Instead of a mutating builder, an
AIR here is a *traced constraint program*: one Python function evaluated both

  * on device over whole LDE-domain row vectors (base-field `GF` arrays,
    vectorized over all rows at once), and
  * on host at a single out-of-domain point (extension-field ints),

so the prover and verifier share one source of truth for the constraints.

Constraints are polynomial expressions in frame values using only +, -, *
and `alg.const(c)`. Three groups, each with its own zerofier:
  transition — vanish on all rows but the last
  first      — vanish on row 0
  last       — vanish on row n-1
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ops.ext import ext_add, ext_mul, ext_sub
from ..ops.goldilocks import GF, P


class HostFelt:
    """Extension-field element with operator overloading (host evaluation)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = (v[0] % P, v[1] % P)

    def __add__(self, o):
        return HostFelt(ext_add(self.v, o.v))

    def __sub__(self, o):
        return HostFelt(ext_sub(self.v, o.v))

    def __mul__(self, o):
        return HostFelt(ext_mul(self.v, o.v))

    def __neg__(self):
        return HostFelt((-self.v[0] % P, -self.v[1] % P))


class HostVec:
    """Vector of HostFelts with elementwise operators (host evaluation of
    vectorized constraint helpers)."""

    __slots__ = ("items",)

    def __init__(self, items):
        self.items = list(items)

    def _zip(self, o, op):
        if isinstance(o, HostVec):
            return HostVec([op(a, b) for a, b in zip(self.items, o.items)])
        return HostVec([op(a, o) for a in self.items])

    def __add__(self, o):
        return self._zip(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._zip(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._zip(o, lambda a, b: a * b)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return HostVec(self.items[i])
        return self.items[i]


class HostAlgebra:
    felt = HostFelt

    @staticmethod
    def const(c: int):
        return HostFelt((c % P, 0))

    @staticmethod
    def cmul(c: int, x):
        return HostFelt(ext_mul((c % P, 0), x.v))

    # -- vector helpers (k-lane stacks of felts) --

    @staticmethod
    def stack(felts):
        return HostVec(felts)

    @staticmethod
    def rot(vec, r: int):
        k = len(vec)
        return HostVec([vec[(i + r) % k] for i in range(k)])

    @staticmethod
    def shift_down(vec, r: int):
        k = len(vec)
        zero = HostFelt((0, 0))
        return HostVec([vec[i + r] if i + r < k else zero for i in range(k)])

    @staticmethod
    def weighted_sum(vec, weights):
        acc = HostFelt((0, 0))
        for w, x in zip(weights, vec.items):
            acc = acc + HostAlgebra.cmul(w, x)
        return acc

    @staticmethod
    def vcmul(c: int, vec):
        return HostVec([HostAlgebra.cmul(c, x) for x in vec.items])

    @staticmethod
    def unstack(vec):
        return list(vec.items)

    @staticmethod
    def vconst_bits(bits):
        return HostVec([HostFelt((int(b) % P, 0)) for b in bits])

    @staticmethod
    def vconst(vals):
        return HostVec([HostFelt((int(v) % P, 0)) for v in vals])

    @staticmethod
    def col_range(frame, offset_index: int, start: int, count: int):
        return HostVec(frame.rows[offset_index][start : start + count])

    @staticmethod
    def vconcat(vecs):
        items = []
        for v in vecs:
            items.extend(v.items)
        return HostVec(items)

    @staticmethod
    def stack_len(vec) -> int:
        return len(vec)

    @staticmethod
    def pad_stack(vec, out_len: int):
        zero = HostFelt((0, 0))
        items = list(vec.items) + [zero] * (out_len - len(vec))
        return HostVec(items[:out_len])

    @staticmethod
    def shift_up(vec, r: int, out_len: int):
        zero = HostFelt((0, 0))
        items = [zero] * r + list(vec.items)
        items = items + [zero] * (out_len - len(items))
        return HostVec(items[:out_len])


class DeviceAlgebra:
    """Constraint evaluation over base-field row vectors (shape (N,))."""

    def __init__(self, n_rows: int):
        self.n_rows = n_rows

    def const(self, c: int):
        import jax.numpy as jnp
        import numpy as np

        c = c % P
        return GF(
            jnp.full((self.n_rows,), np.uint32(c & 0xFFFFFFFF), jnp.uint32),
            jnp.full((self.n_rows,), np.uint32(c >> 32), jnp.uint32),
        )

    @staticmethod
    def cmul(c: int, x: GF):
        return x.cmul(c)

    # -- vector helpers: stacks become leading array axes, so 32-bit-wide
    # bit operations are single array ops instead of 32 scalar graphs --

    @staticmethod
    def stack(felts):
        return GF.stack(felts, axis=0)  # (k, N)

    @staticmethod
    def rot(vec: GF, r: int):
        import jax.numpy as jnp

        return GF(jnp.roll(vec.lo, -r, axis=0), jnp.roll(vec.hi, -r, axis=0))

    @staticmethod
    def shift_down(vec: GF, r: int):
        import jax.numpy as jnp

        if r == 0:
            return vec
        pad_lo = jnp.zeros((r,) + vec.lo.shape[1:], vec.lo.dtype)
        return GF(
            jnp.concatenate([vec.lo[r:], pad_lo], axis=0),
            jnp.concatenate([vec.hi[r:], pad_lo], axis=0),
        )

    @staticmethod
    def weighted_sum(vec: GF, weights):
        import jax.numpy as jnp
        import numpy as np

        from ..ops.goldilocks import mul

        w = np.array([int(x) % P for x in weights], dtype=object)
        w_lo = jnp.asarray(
            np.array([v & 0xFFFFFFFF for v in w], dtype=np.uint32)
        ).reshape((-1,) + (1,) * (vec.lo.ndim - 1))
        w_hi = jnp.asarray(
            np.array([v >> 32 for v in w], dtype=np.uint32)
        ).reshape((-1,) + (1,) * (vec.lo.ndim - 1))
        prod = GF(*mul(vec.lo, vec.hi, w_lo, w_hi))
        return prod.sum(axis=0)

    @staticmethod
    def vcmul(c: int, vec: GF):
        return vec.cmul(c)

    @staticmethod
    def unstack(vec: GF):
        return [GF(vec.lo[i], vec.hi[i]) for i in range(vec.lo.shape[0])]

    @staticmethod
    def vconst_bits(bits):
        """Constant bit-vector as a (k, 1) broadcastable array (one constant
        instead of k full-width materializations)."""
        import jax.numpy as jnp
        import numpy as np

        arr = np.array([int(b) & 0xFFFFFFFF for b in bits], dtype=np.uint32)
        lo = jnp.asarray(arr)[:, None]
        return GF(lo, jnp.zeros_like(lo))

    @staticmethod
    def vconst(vals):
        """Arbitrary constant stack as a (k, 1) broadcastable array."""
        import jax.numpy as jnp
        import numpy as np

        v = [int(x) % P for x in vals]
        lo = jnp.asarray(np.array([x & 0xFFFFFFFF for x in v], dtype=np.uint32))[:, None]
        hi = jnp.asarray(np.array([x >> 32 for x in v], dtype=np.uint32))[:, None]
        return GF(lo, hi)

    @staticmethod
    def stack_len(vec) -> int:
        return vec.lo.shape[0]

    @staticmethod
    def pad_stack(vec, out_len: int):
        import jax.numpy as jnp

        k = vec.lo.shape[0]
        if k == out_len:
            return vec
        pad = jnp.zeros((out_len - k,) + vec.lo.shape[1:], vec.lo.dtype)
        return GF(
            jnp.concatenate([vec.lo, pad], axis=0),
            jnp.concatenate([vec.hi, pad], axis=0),
        )

    @staticmethod
    def shift_up(vec, r: int, out_len: int):
        import jax.numpy as jnp

        keep = min(vec.lo.shape[0], out_len - r)
        pre = jnp.zeros((r,) + vec.lo.shape[1:], vec.lo.dtype)
        post = jnp.zeros(
            (out_len - r - keep,) + vec.lo.shape[1:], vec.lo.dtype
        )
        return GF(
            jnp.concatenate([pre, vec.lo[:keep], post], axis=0),
            jnp.concatenate([pre, vec.hi[:keep], post], axis=0),
        )

    @staticmethod
    def col_range(frame, offset_index: int, start: int, count: int):
        rs = frame.rows_stacked
        return GF(
            rs.lo[offset_index, start : start + count],
            rs.hi[offset_index, start : start + count],
        )

    @staticmethod
    def vconcat(vecs):
        return GF.concatenate(vecs, axis=0)


@dataclass
class Frame:
    """One evaluation frame: trace column values at each declared row offset
    (`rows[k][i]` = column i at offset `air.frame_offsets[k]`), public
    inputs, and periodic-column values — all lifted to the algebra.

    `local` / `next` alias offsets 0 and 1 for the common 2-row case."""

    rows: list
    public: list
    periodic: list
    # offset-0 values of public columns (verifier-reconstructible full-length
    # columns derived from the public inputs; not committed)
    public_cols: list = None
    # device only: pre-stacked (n_offsets, n_cols, N) trace values, so AIRs
    # can take contiguous column ranges with one slice instead of stacking
    # felts bit by bit
    rows_stacked: object = None
    # Per-proof extension-field challenges sampled between the main and aux
    # commitments, exposed as 2*n_challenges BASE-field scalars (components
    # c0, c1 of each challenge) lifted to the algebra. Degree 0 in x.
    challenges: list = None

    @property
    def local(self):
        return self.rows[0]

    @property
    def next(self):
        return self.rows[1]

    def at_offset(self, offset: int, air: "Air"):
        return self.rows[air.frame_offsets.index(offset)]


def constraint_count(c) -> int:
    """Constraints may be single felts/(N,)-vectors or stacked blocks
    (HostVec / (K, N) GF); each block row is one constraint (own alpha
    power). Prover and verifier flatten in identical order."""
    if isinstance(c, HostVec):
        return len(c)
    if isinstance(c, HostFelt):
        return 1
    # device GF: (N,) single or (K, N) block
    return c.lo.shape[0] if c.lo.ndim == 2 else 1


def flatten_host_constraints(constraints) -> list:
    """HostFelt list with blocks expanded, in order."""
    out = []
    for c in constraints:
        if isinstance(c, HostVec):
            out.extend(c.items)
        else:
            out.append(c)
    return out


class Air:
    """Subclass and override. `n_cols`/`constraint_degree` are class attrs.

    `periodic_columns()` returns fixed repeating patterns (each a list of
    ints whose length is a power of two dividing the trace length): round
    constants, round-type selectors, etc. They are not committed — both
    prover and verifier evaluate them directly (the verifier at the OOD
    point via the pattern's interpolant). Equivalent role to plonky2's
    constant/preprocessed polynomials (SURVEY.md N4).
    """

    n_cols: int = 0
    n_public: int = 0
    n_public_cols: int = 0  # number of columns public_columns() returns
    constraint_degree: int = 3  # max total degree of any constraint
    # Row offsets the constraints may reference. Offsets beyond {0, 1} make
    # the prover open the trace at z * g^k for each offset k (multi-row
    # frames, e.g. the SHA-256 message schedule's 16-row window).
    frame_offsets: list[int] = [0, 1]
    # Two-phase commitment (lookup arguments, permutation checks): after the
    # main trace is committed, the prover samples n_challenges extension
    # challenges from the transcript, derives n_aux_cols auxiliary columns
    # via aux_columns(), and commits them separately. Constraints see the
    # frame over [main ‖ aux] columns plus the challenge components.
    n_aux_cols: int = 0
    n_challenges: int = 0

    def periodic_columns(self) -> list[list[int]]:
        return []

    def validate_publics(self, publics) -> bool:
        """Structural validity of (untrusted) public inputs. Overrides must
        be total — called by the verifier before any other use of the
        publics (public_columns may assume validated inputs)."""
        return len(publics) == self.n_public

    def aux_columns(self, trace, challenges: list[tuple[int, int]], publics):
        """Phase-2 witness generation (prover side): given the main trace
        (GF (n_cols, n) on device) and the sampled challenges, return the
        auxiliary columns as GF (n_aux_cols, n)."""
        raise NotImplementedError

    def public_columns(self, publics: list[int], n_rows: int) -> list[list[int]]:
        """Full-length columns derived deterministically from the public
        inputs (e.g. per-segment message/digest words). Both sides build
        them independently: the prover LDEs them for constraint evaluation;
        the verifier interpolates them at the OOD point. Unlike
        periodic_columns these may differ per instance; unlike trace columns
        they are not committed."""
        return []

    def eval_transition(self, frame: Frame, alg) -> list:
        """Vanish on every row except the last (classic 2-row step)."""
        return []

    def eval_cyclic(self, frame: Frame, alg) -> list:
        """Vanish on EVERY row, with row references wrapping cyclically.
        Constraints here must be gated by periodic selectors wherever the
        wrapped reference would be meaningless."""
        return []

    def eval_first(self, frame: Frame, alg) -> list:
        return []

    def eval_last(self, frame: Frame, alg) -> list:
        return []

    @property
    def n_constraints(self) -> int:
        # Evaluate symbolically on host with zeros to count constraints.
        zero = HostFelt((0, 0))
        total = self.n_cols + self.n_aux_cols
        frame = Frame(
            rows=[[zero] * total for _ in self.frame_offsets],
            public=[zero] * self.n_public,
            periodic=[zero] * len(self.periodic_columns()),
            public_cols=[zero] * self.n_public_cols,
            challenges=[zero] * (2 * self.n_challenges),
        )
        alg = HostAlgebra()
        return sum(
            constraint_count(c)
            for group in (
                self.eval_first(frame, alg),
                self.eval_transition(frame, alg),
                self.eval_cyclic(frame, alg),
                self.eval_last(frame, alg),
            )
            for c in group
        )
