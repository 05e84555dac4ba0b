"""Poseidon Merkle tree commitments (device build, host open/verify).

TPU-native equivalent of plonky2's Merkle cap commitment machinery (SURVEY.md
N3/N7 — the FRI commit step inside `circuit.prove()`). Leaves are rows of a
(n_leaves, row_width) field matrix; the tree is built layer-by-layer on device
with batched Poseidon calls, then copied to host once, where openings are
cheap array inspections.

Digests are 4 Goldilocks elements. Leaf hash = sponge(row); inner =
two_to_one(left, right). n_leaves must be a power of two.
"""

from __future__ import annotations

import jax
import numpy as np

from . import poseidon as ps
from .goldilocks import GF


@jax.jit
def _leaf_hashes(rows: GF) -> GF:
    return ps.hash_no_pad(rows)


@jax.jit
def _next_layer(layer: GF) -> GF:
    # layer: (n, 4) -> (n//2, 4)
    left = layer[0::2]
    right = layer[1::2]
    return ps.two_to_one(left, right)


class MerkleTree:
    """Holds all layers host-side after a device build."""

    def __init__(self, layers: list[np.ndarray]):
        # layers[0]: (n_leaves, 4) uint64-ish object ints; layers[-1]: (1, 4)
        self.layers = layers

    @property
    def root(self) -> list[int]:
        return list(self.layers[-1][0])

    @property
    def n_leaves(self) -> int:
        return len(self.layers[0])

    @classmethod
    def build(cls, rows: GF) -> "MerkleTree":
        """rows: (n_leaves, width) GF on device; n_leaves a power of two."""
        n = rows.shape[0]
        assert n & (n - 1) == 0, "n_leaves must be a power of two"
        digests = [_leaf_hashes(rows)]
        while digests[-1].shape[0] > 1:
            digests.append(_next_layer(digests[-1]))
        layers = [d.to_ints() for d in digests]
        return cls(layers)

    def open(self, index: int) -> list[list[int]]:
        """Sibling path from leaf `index` to the root (exclusive)."""
        path = []
        idx = index
        for layer in self.layers[:-1]:
            path.append(list(layer[idx ^ 1]))
            idx >>= 1
        return path


def verify_opening(
    root: list[int], index: int, leaf_row: list[int], path: list[list[int]]
) -> bool:
    """Host-side verification: leaf_row is the raw row (pre-hash).
    Uses the native C++ core when available."""
    import os

    if os.environ.get("TMX_NO_NATIVE") != "1":
        from ..utils import native

        out = native.merkle_verify_native(
            list(root), index, list(leaf_row), path
        )
        if out is not None:
            return out
    digest = ps.hash_ints(list(leaf_row))
    idx = index
    for sibling in path:
        if idx & 1:
            digest = ps.two_to_one_ints(sibling, digest)
        else:
            digest = ps.two_to_one_ints(digest, sibling)
        idx >>= 1
    return digest == list(root)
