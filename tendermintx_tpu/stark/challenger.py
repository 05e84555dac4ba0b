"""Fiat-Shamir challenger: a duplex Poseidon sponge over Goldilocks.

Host-side (Python ints) — transcript logic is sequential and tiny; the prover
and verifier must run it identically. Equivalent role to plonky2's
`Challenger` (SURVEY.md N3/N4: transcript hashing inside `circuit.prove()` /
`circuit.verify()`, /root/reference/circuits/step.rs:223-226).
"""

from __future__ import annotations

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
