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
import jax.numpy as jnp
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


@jax.jit
def _inner_layers(leaves: GF) -> GF:
    """Every inner tree layer from (n, 4) leaf digests as ONE compiled
    program containing ONE rolled compression loop.

    Returns (levels, n/2, 4) where layer l's real nodes are the first
    n >> (l+1) rows (the rest is padding garbage from re-concatenation —
    the fixed (n/2, 4) buffer keeps every loop iteration the same shape,
    so the whole tree costs two compiled Poseidon graphs per n, SHARED
    across all row widths and all FRI layer trees of that size, instead of
    log2(n) distinct shapes per (n, width). On the remote-TPU backend the
    per-process compile time of those graphs dominates the prover."""
    n = leaves.shape[0]
    levels = n.bit_length() - 1  # inner layers: sizes n/2 .. 1
    half = n // 2
    first = ps.two_to_one(leaves[0::2], leaves[1::2])  # (n/2, 4)
    out = GF(
        jnp.zeros((levels, half, 4), jnp.uint32),
        jnp.zeros((levels, half, 4), jnp.uint32),
    )
    out = GF(out.lo.at[0].set(first.lo), out.hi.at[0].set(first.hi))

    def body(l, carry):
        D, acc = carry
        res = ps.two_to_one(D[0::2], D[1::2])  # (n/4, 4); prefix real
        D2 = GF.concatenate([res, res], axis=0)  # back to (n/2, 4)
        acc = GF(acc.lo.at[l].set(D2.lo), acc.hi.at[l].set(D2.hi))
        return (D2, acc)

    _, out = jax.lax.fori_loop(1, levels, body, (first, out))
    return out


class MerkleTree:
    """Layers stay on DEVICE after the build; openings gather sibling paths
    with device indexing and fetch only the gathered digests (VERDICT r1:
    full-layer host conversion made MB-scale fetches through the TPU relay
    the prover's bottleneck — only roots and queried paths ever leave the
    device)."""

    def __init__(self, dev_layers: list[GF]):
        # dev_layers[0]: (n_leaves, 4) GF; dev_layers[-1]: (1, 4)
        self.dev_layers = dev_layers
        self._root = None

    @property
    def root(self) -> list[int]:
        if self._root is None:
            top = self.dev_layers[-1]
            # one host fetch (lo‖hi stacked), not two
            both = np.asarray(jnp.concatenate([top.lo[0], top.hi[0]]))
            self._root = [
                int(both[i]) | (int(both[4 + i]) << 32) for i in range(4)
            ]
        return self._root

    @property
    def n_leaves(self) -> int:
        return int(self.dev_layers[0].shape[0])

    @classmethod
    def build(cls, rows: GF, leaf_fn=None) -> "MerkleTree":
        """rows: (n_leaves, width) GF on device; n_leaves a power of two.
        leaf_fn optionally overrides the leaf hash (e.g. the row-sharded
        sponge from parallel/prover.py); it must equal hash_no_pad."""
        n = int(rows.shape[0])
        assert n & (n - 1) == 0, "n_leaves must be a power of two"
        leaves = (leaf_fn or _leaf_hashes)(rows)
        if n == 1:
            return cls([leaves])
        inner = _inner_layers(leaves)
        levels = n.bit_length() - 1
        dev_layers = [leaves] + [
            GF(
                inner.lo[l, : max(n >> (l + 1), 1)],
                inner.hi[l, : max(n >> (l + 1), 1)],
            )
            for l in range(levels)
        ]
        return cls(dev_layers)

    def open(self, index: int) -> list[list[int]]:
        """Sibling path from leaf `index` to the root (exclusive)."""
        return self.open_many([index])[index]

    def sibling_gather(self, indices: list[int]):
        """Device-side gather of all sibling digests for `indices`.

        Returns (dev GF (n_inner*k, 4), uniq, n_inner); decode the fetched
        ints with `decode_paths`. Separated from `open_many` so callers can
        batch the host fetch across several trees (ops/goldilocks.py
        fetch_ints_many)."""
        uniq = sorted(set(int(i) for i in indices))
        k = len(uniq)
        n_inner = len(self.dev_layers) - 1
        if n_inner == 0 or k == 0:
            return GF.zeros((0, 4)), uniq, n_inner
        gathers = []
        for l in range(n_inner):
            sibs = jnp.asarray([(i >> l) ^ 1 for i in uniq])
            gathers.append(self.dev_layers[l][sibs])  # (k, 4)
        return GF.concatenate(gathers, axis=0), uniq, n_inner

    @staticmethod
    def decode_paths(allg, uniq: list[int], n_inner: int):
        """allg: (n_inner*k, 4) object ints from sibling_gather's fetch."""
        k = len(uniq)
        return {
            idx: [
                [int(v) for v in allg[l * k + qi]] for l in range(n_inner)
            ]
            for qi, idx in enumerate(uniq)
        }

    def open_many(self, indices: list[int]) -> dict[int, list[list[int]]]:
        """Paths for many leaves with ONE device gather + host fetch."""
        dev, uniq, n_inner = self.sibling_gather(indices)
        if n_inner == 0 or not uniq:
            return {i: [] for i in uniq}
        return self.decode_paths(dev.to_ints(), uniq, n_inner)


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
