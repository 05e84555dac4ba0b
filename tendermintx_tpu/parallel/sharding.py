"""Multi-chip sharding of the proving pipeline.

The reference has no distributed backend at all (SURVEY.md §2c — rayon
thread pools plus a hosted proving platform). Here the data-parallel axes
inherent in the workload map onto a JAX device mesh:

  * validator lanes  -> sharded Ed25519 ladders + SHA-256 leaf hashing
    (embarrassingly parallel; per-chip groups of validators)
  * voting-power sums -> psum over ICI
  * O(N^2) pubkey intersection -> all_gather of (tiny) pubkey blocks
  * FRI/Merkle layer reductions -> all_gather of per-shard digests, log-depth
    tail on every chip (identical replicated result)

Everything is expressed with shard_map over a 1-D "lanes" mesh so XLA
inserts the collectives; the same code runs on a virtual CPU mesh in tests
and on a real pod slice in production.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circuits import gadgets as g
from ..ops import ed25519, poseidon, sha256
from ..ops.goldilocks import GF


def make_lane_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("lanes",))


def sharded_lane_checks(mesh: Mesh):
    """Returns a jitted function over the full lane arrays that runs the
    signature + leaf-hash + voting checks with lanes sharded across the mesh.

    fn(table_x, table_y, table_t, bits2, rx, ry, sig_r, sig_s, sig_pk,
       messages, msg_len, k_q, leaf_bytes, leaf_len,
       vp_lo, vp_hi, signed, enabled)
      -> (all_sigs_ok (), leaf_digests (B, 32) [gathered],
          signed_power (lo, hi), total_power (lo, hi))
    """

    lane = P("lanes")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(lane,) * 18,
        out_specs=(P(), lane, P(), P()),
        check_vma=False,
    )
    def fn(
        table_x, table_y, table_t, bits2, rx, ry,
        sig_r, sig_s, sig_pk, messages, msg_len, k_q,
        leaf_bytes, leaf_len, vp_lo, vp_hi, signed, enabled,
    ):
        # per-shard: verify this chip's group of validator signatures with
        # full on-device witness binding (challenge SHA-512 included)
        sig_ok_local = jnp.all(
            ed25519.verify_bound(
                table_x, table_y, table_t, bits2, rx, ry,
                sig_r, sig_s, sig_pk, messages, msg_len, k_q,
            )
        )
        sig_ok = jax.lax.pmin(
            sig_ok_local.astype(jnp.uint32), axis_name="lanes"
        ) == 1
        # per-shard SHA-256 validator leaves
        digests = g.hash_validator_leaves(leaf_bytes, leaf_len)
        # Voting sums ride ICI: per-shard exact u64 partials, psum'd in
        # 16-bit chunks so no chunk sum can wrap uint32, then recombined
        # with explicit carries. Totals are < 2^60 by CometBFT's invariant
        # (reference voting.rs:1-4), so the top chunk never overflows.
        def masked_sum(mask):
            lo, hi = g.u64_sum_masked(vp_lo, vp_hi, mask)
            c0 = jax.lax.psum(lo & 0xFFFF, "lanes")
            c1 = jax.lax.psum(lo >> 16, "lanes")
            c2 = jax.lax.psum(hi & 0xFFFF, "lanes")
            c3 = jax.lax.psum(hi >> 16, "lanes")
            lo_final = c0 + ((c1 & 0xFFFF) << 16)
            wrap = (lo_final < c0).astype(jnp.uint32)
            carry = (c1 >> 16) + wrap
            hi_final = c2 + ((c3 & 0xFFFF) << 16) + carry
            return lo_final, hi_final

        signed_power = masked_sum(signed & enabled)
        total_power = masked_sum(enabled)
        return sig_ok, digests, signed_power, total_power

    return jax.jit(fn)


def sharded_poseidon_throughput(mesh: Mesh):
    """Data-parallel Poseidon permutation for scaling benchmarks."""

    @partial(jax.shard_map, mesh=mesh, in_specs=P("lanes"), out_specs=P("lanes"), check_vma=False)
    def fn(states: GF) -> GF:
        return poseidon.permute(states)

    return jax.jit(fn)


def sharded_sha256(mesh: Mesh):
    """Lane-sharded batched SHA-256 (blocks pre-padded)."""

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P("lanes"), P("lanes")), out_specs=P("lanes"), check_vma=False
    )
    def fn(blocks, n_active):
        return sha256.sha256_blocks(blocks, n_active)

    return jax.jit(fn)
