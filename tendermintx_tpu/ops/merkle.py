"""Poseidon Merkle tree commitments (device build, host open/verify).

TPU-native equivalent of plonky2's Merkle cap commitment machinery (SURVEY.md
N3/N7 — the FRI commit step inside `circuit.prove()`). Leaves are rows of a
(n_leaves, row_width) field matrix; the tree is built layer-by-layer on device
with batched Poseidon calls, then copied to host once, where openings are
cheap array inspections.

Digests are 4 Goldilocks elements. Leaf hash = sponge(row zero-padded to a
multiple of the sponge RATE); inner = two_to_one(left, right). n_leaves must
be a power of two.

Row padding: leaf rows are zero-padded to a RATE (8) multiple before
hashing, so every sponge absorb is a full-chunk overwrite — the invariant
the recursive wrapper AIR's one-permutation-per-row layout relies on
(stark/recursion.py). For rows of width <= 8 the digest is unchanged
(overwriting zero lanes of a zero state); wider non-multiple rows get new
digests, which only re-keys commitments (no external format depends on
them).

Caps: a commitment can be a CAP — the 2^k digests at depth k from the root
(plonky2's MerkleCap; the reference consumes it via its GenericConfig,
SURVEY.md N2/N3). Openings then carry paths only up to the cap, saving
(depth - k) * 32 bytes per query per tree, the dominant wire cost at 28
queries (VERDICT r3 next-step #6).
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
def _leaf_hashes_cols(cols: GF) -> GF:
    return ps.hash_no_pad_cols(cols)


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


def pad_row_width(rows: GF) -> GF:
    """Zero-pad the last axis to a RATE multiple (see module docstring)."""
    w = int(rows.shape[-1])
    extra = (-w) % ps.RATE
    if not extra:
        return rows
    z = jnp.zeros(tuple(rows.shape[:-1]) + (extra,), rows.lo.dtype)
    return GF(
        jnp.concatenate([rows.lo, z], axis=-1),
        jnp.concatenate([rows.hi, z], axis=-1),
    )


def pad_row_ints(row: list[int]) -> list[int]:
    """Host-side analog of pad_row_width for an opened leaf row."""
    return list(row) + [0] * ((-len(row)) % ps.RATE)


def cap_levels(n_leaves: int, cap_bits: int) -> int:
    """Number of path levels below a 2^min(cap_bits, depth)-entry cap."""
    depth = max(n_leaves.bit_length() - 1, 0)
    return depth - min(cap_bits, depth)


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

    def cap_dev(self, cap_bits: int) -> GF:
        """The cap as its DEVICE (2^min(cap_bits, depth), 4) digest layer —
        no host fetch. Callers that drive the transcript on device
        (stark/challenger.DeviceChallenger) absorb this and batch the host
        fetch with everything else at the end of the commit phase."""
        depth = len(self.dev_layers) - 1
        return self.dev_layers[depth - min(cap_bits, depth)]

    def cap(self, cap_bits: int) -> list[list[int]]:
        """The 2^min(cap_bits, depth) digests at cap depth (ONE host fetch)."""
        depth = len(self.dev_layers) - 1
        layer = self.dev_layers[depth - min(cap_bits, depth)]
        k = int(layer.shape[0])
        both = np.asarray(
            jnp.concatenate([layer.lo.reshape(-1), layer.hi.reshape(-1)])
        )
        flat = [
            int(both[i]) | (int(both[4 * k + i]) << 32) for i in range(4 * k)
        ]
        return [flat[4 * i : 4 * (i + 1)] for i in range(k)]

    @classmethod
    def build(cls, rows: GF, leaf_fn=None) -> "MerkleTree":
        """rows: (n_leaves, width) GF on device; n_leaves a power of two.
        leaf_fn optionally overrides the leaf hash (e.g. the row-sharded
        sponge from parallel/prover.py); it must equal hash_no_pad."""
        n = int(rows.shape[0])
        assert n & (n - 1) == 0, "n_leaves must be a power of two"
        # Probe the Pallas kernel from THIS clean (host) context: inside
        # the jitted leaf/layer programs the probe must defer, and without
        # an eager probe somewhere in the product path the dispatch would
        # silently stay on XLA forever (ops/poseidon_pallas.available).
        ps._pallas_ok()
        rows = pad_row_width(rows)
        leaves = (leaf_fn or _leaf_hashes)(rows)
        return cls._from_leaves(leaves, n)

    @classmethod
    def build_cols(cls, cols: GF) -> "MerkleTree":
        """Column-major build: cols (width, n_leaves) GF on device. Digest-
        identical to build(cols.T) but never materializes the row-major
        copy (ops/poseidon.hash_no_pad_cols) — the single-chip prover's
        multi-GB LDEs are column-major, and the transposed duplicate was
        the N=128 HBM OOM."""
        n = int(cols.shape[1])
        assert n & (n - 1) == 0, "n_leaves must be a power of two"
        ps._pallas_ok()
        w = int(cols.shape[0])
        extra = (-w) % ps.RATE
        if extra:
            z = jnp.zeros((extra, n), cols.lo.dtype)
            cols = GF(
                jnp.concatenate([cols.lo, z], axis=0),
                jnp.concatenate([cols.hi, z], axis=0),
            )
        leaves = _leaf_hashes_cols(cols)
        return cls._from_leaves(leaves, n)

    @classmethod
    def _from_leaves(cls, leaves: GF, n: int) -> "MerkleTree":
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

    def sibling_gather(self, indices: list[int], cap_bits: int = 0):
        """Device-side gather of all sibling digests for `indices`, up to
        (exclusive) the cap level.

        Returns (dev GF (n_inner*k, 4), uniq, n_inner); decode the fetched
        ints with `decode_paths`. Separated from `open_many` so callers can
        batch the host fetch across several trees (ops/goldilocks.py
        fetch_ints_many)."""
        uniq = sorted(set(int(i) for i in indices))
        k = len(uniq)
        n_inner = cap_levels(self.n_leaves, cap_bits)
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
    cap: list[list[int]],
    index: int,
    leaf_row: list[int],
    path: list[list[int]],
    levels: int | None = None,
) -> bool:
    """Host-side verification against a Merkle CAP: leaf_row is the raw row
    (pre-hash, pre-padding); the path climbs len(path) levels and the
    resulting digest must equal cap[index >> len(path)].

    `levels`, when given, pins the expected path length (the verifier
    derives it from the tree size + cap_bits; a malformed path length must
    fail here, not alias into a wrong cap slot). A single full-depth root
    is the cap special case [root]. Uses the native C++ core when
    available."""
    if levels is not None and len(path) != levels:
        return False
    slot = index >> len(path)
    if not 0 <= slot < len(cap):
        return False
    expected = cap[slot]
    row = pad_row_ints(leaf_row)
    import os

    if os.environ.get("TMX_NO_NATIVE") != "1":
        from ..utils import native

        out = native.merkle_verify_native(
            list(expected), index, row, path
        )
        if out is not None:
            return out
    digest = ps.hash_ints(row)
    idx = index
    for sibling in path:
        if idx & 1:
            digest = ps.two_to_one_ints(sibling, digest)
        else:
            digest = ps.two_to_one_ints(digest, sibling)
        idx >>= 1
    return digest == list(expected)
