"""Fiat-Shamir challenger: a duplex Poseidon sponge over Goldilocks.

Host-side (Python ints) — transcript logic is sequential and tiny; the prover
and verifier must run it identically. Equivalent role to plonky2's
`Challenger` (SURVEY.md N3/N4: transcript hashing inside `circuit.prove()` /
`circuit.verify()`, /root/reference/circuits/step.rs:223-226).

`DeviceChallenger` is the prover-side device mirror: commit phases absorb
Merkle caps and sample fold/statement challenges as DEVICE scalars so the
whole commit loop dispatches asynchronously — on the remote-TPU relay every
blocking cap fetch costs ~0.7 s, and the per-layer fetches were the serial
term of the N=128 FRI block. The host challenger stays authoritative: after
the async phase the caller fetches caps + device-sampled values in ONE
transfer, replays this host sponge over them, and raises if the two ever
disagree (they cannot unless the device permutation itself is wrong, which
would also break every Merkle commitment).
"""

from __future__ import annotations

from functools import lru_cache

from ..ops import poseidon as ps
from ..ops.goldilocks import P


class Challenger:
    def __init__(self):
        self._state = [0] * ps.WIDTH
        self._input: list[int] = []
        self._output: list[int] = []

    # -- observation --
    def observe_element(self, x: int):
        # Explicit raise (not assert): observed values may come from an
        # untrusted proof, and asserts vanish under `python -O`.
        if not 0 <= x < P:
            raise ValueError(f"transcript element out of range: {x}")
        self._output.clear()
        self._input.append(x)
        if len(self._input) == ps.RATE:
            self._duplex()

    def observe_elements(self, xs):
        for x in xs:
            self.observe_element(int(x))

    def observe_ext(self, x: tuple[int, int]):
        self.observe_elements(list(x))

    def observe_digest(self, digest):
        if len(digest) != ps.DIGEST:
            raise ValueError("bad digest length")
        self.observe_elements(digest)

    def observe_cap(self, cap):
        """Absorb a Merkle cap (list of digests) in order."""
        if not cap:
            raise ValueError("empty cap")
        for digest in cap:
            self.observe_digest(digest)

    # -- sampling --
    def sample(self) -> int:
        if self._input or not self._output:
            self._duplex()
        return self._output.pop()

    def sample_ext(self) -> tuple[int, int]:
        return (self.sample(), self.sample())

    def sample_index(self, size: int) -> int:
        """Uniform-ish index in [0, size); size must be a power of two."""
        assert size & (size - 1) == 0
        return self.sample() & (size - 1)

    def sample_indices(self, n: int, size: int) -> list[int]:
        return [self.sample_index(size) for _ in range(n)]

    # -- internals --
    def _duplex(self):
        for i, v in enumerate(self._input):
            self._state[i] = v
        self._state = ps.permute_ints(self._state)
        self._input.clear()
        self._output = list(self._state[: ps.RATE])


# ---------------------------------------------------------------------------
# Device mirror
# ---------------------------------------------------------------------------


class _TraceSponge:
    """Element-for-element mirror of Challenger over traced GF scalars.

    All control flow is Python-static (list lengths are known at trace
    time), so a fixed (absorb, sample) sequence compiles to one program.
    """

    def __init__(self, state, inp, out):
        self.state = state  # 12 GF scalars
        self.inp = inp
        self.out = out

    def observe(self, x):
        self.out = []
        self.inp.append(x)
        if len(self.inp) == ps.RATE:
            self._duplex()

    def sample(self):
        if self.inp or not self.out:
            self._duplex()
        return self.out.pop()

    def _duplex(self):
        from ..ops.goldilocks import GF

        st = list(self.state)
        for i, v in enumerate(self.inp):
            st[i] = v
        arr = ps.permute(GF.stack(st, axis=0))  # (12,)
        self.state = [arr[i] for i in range(ps.WIDTH)]
        self.inp = []
        self.out = [arr[i] for i in range(ps.RATE)]


def _stack_or_empty(felts):
    from ..ops.goldilocks import GF

    return GF.stack(felts, axis=0) if felts else GF.zeros((0,))


@lru_cache(maxsize=None)
def _absorb_sample_fn(n_elems: int, in_len: int, n_out: int):
    """Jitted: absorb `n_elems` felts (clearing the output buffer first,
    like observe does) then sample `n_out` felts. Keyed by the static
    lengths; the entry output buffer is irrelevant because the first op is
    an observe."""
    import jax

    from ..ops.goldilocks import GF

    @jax.jit
    def f(state, inbuf, elems):
        sp = _TraceSponge(
            [state[i] for i in range(ps.WIDTH)],
            [inbuf[i] for i in range(in_len)],
            [],
        )
        for i in range(n_elems):
            sp.observe(elems[i])
        vals = [sp.sample() for _ in range(n_out)]
        return (
            GF.stack(sp.state, axis=0),
            _stack_or_empty(sp.inp),
            _stack_or_empty(sp.out),
            _stack_or_empty(vals),
        )

    return f


@lru_cache(maxsize=None)
def _sample_fn(in_len: int, out_len: int, n_out: int):
    """Jitted: sample `n_out` felts from the current sponge buffers."""
    import jax

    from ..ops.goldilocks import GF

    @jax.jit
    def f(state, inbuf, outbuf):
        sp = _TraceSponge(
            [state[i] for i in range(ps.WIDTH)],
            [inbuf[i] for i in range(in_len)],
            [outbuf[i] for i in range(out_len)],
        )
        vals = [sp.sample() for _ in range(n_out)]
        return (
            GF.stack(sp.state, axis=0),
            _stack_or_empty(sp.inp),
            _stack_or_empty(sp.out),
            _stack_or_empty(vals),
        )

    return f


class DeviceChallenger:
    """Device-resident snapshot of a host Challenger (see module docstring).

    Holds the sponge state + buffers as device GF arrays; every method is
    one jitted dispatch (async on accelerator backends). Sampled values are
    returned as GF arrays of shape (n_out,) — the caller threads them into
    downstream kernels without fetching, then later replays the host
    challenger over the fetched commitments and cross-checks.
    """

    def __init__(self, host: Challenger):
        from ..ops.goldilocks import GF
        import numpy as np

        def dev(vals):
            if not vals:
                return GF.zeros((0,))
            return GF.from_ints(np.array(vals, dtype=object))

        self.state = dev(host._state)
        self.inbuf = dev(host._input)
        self.outbuf = dev(host._output)

    def observe_rows_sample(self, rows, n_out: int):
        """Absorb a device (k, w) GF matrix row-major (a Merkle cap: k
        digests of w felts) and sample n_out felts. Returns GF (n_out,)."""
        k = 1
        for d in rows.shape[:-1]:
            k *= int(d)
        w = int(rows.shape[-1])
        flat = rows.reshape(k * w)
        fn = _absorb_sample_fn(k * w, int(self.inbuf.shape[0]), n_out)
        self.state, self.inbuf, self.outbuf, out = fn(
            self.state, self.inbuf, flat
        )
        return out

    def sample_many(self, n_out: int):
        fn = _sample_fn(
            int(self.inbuf.shape[0]), int(self.outbuf.shape[0]), n_out
        )
        self.state, self.inbuf, self.outbuf, out = fn(
            self.state, self.inbuf, self.outbuf
        )
        return out
