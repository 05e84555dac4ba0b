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


class HostAlgebra:
    felt = HostFelt

    @staticmethod
    def const(c: int):
        return HostFelt((c % P, 0))


class DeviceAlgebra:
    """Constraint evaluation over base-field row vectors (shape (N,))."""

    def __init__(self, n_rows: int):
        self.n_rows = n_rows

    def const(self, c: int):
        import jax.numpy as jnp
        import numpy as np

        return GF(
            jnp.full((self.n_rows,), np.uint32(c & 0xFFFFFFFF), jnp.uint32),
            jnp.full((self.n_rows,), np.uint32((c % P) >> 32), jnp.uint32),
        )


@dataclass
class Frame:
    """One evaluation frame: trace column values at each declared row offset
    (`rows[k][i]` = column i at offset `air.frame_offsets[k]`), public
    inputs, and periodic-column values — all lifted to the algebra.

    `local` / `next` alias offsets 0 and 1 for the common 2-row case."""

    rows: list
    public: list
    periodic: list

    @property
    def local(self):
        return self.rows[0]

    @property
    def next(self):
        return self.rows[1]

    def at_offset(self, offset: int, air: "Air"):
        return self.rows[air.frame_offsets.index(offset)]


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
    constraint_degree: int = 3  # max total degree of any constraint
    # Row offsets the constraints may reference. Offsets beyond {0, 1} make
    # the prover open the trace at z * g^k for each offset k (multi-row
    # frames, e.g. the SHA-256 message schedule's 16-row window).
    frame_offsets: list[int] = [0, 1]

    def periodic_columns(self) -> list[list[int]]:
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
        frame = Frame(
            rows=[[zero] * self.n_cols for _ in self.frame_offsets],
            public=[zero] * self.n_public,
            periodic=[zero] * len(self.periodic_columns()),
        )
        alg = HostAlgebra()
        return (
            len(self.eval_first(frame, alg))
            + len(self.eval_transition(frame, alg))
            + len(self.eval_cyclic(frame, alg))
            + len(self.eval_last(frame, alg))
        )
