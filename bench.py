"""Benchmark driver: prints one JSON line for the round harness.

Runs on whatever accelerator JAX finds (real TPU under the driver; set
JAX_PLATFORMS=cpu to force CPU). North-star metric per BASELINE.json:
Poseidon hashes/s/chip — the transcript/Merkle hash that dominates FRI
commitment cost.

`vs_baseline` is measured against a documented proxy: the reference's
plonky2 Poseidon runs ~1e6 hashes/s/core on server CPUs (plonky2 reports
~1 us/permutation single-threaded), and the reference parallelizes over
rayon without any accelerator support (SURVEY.md §2c). vs_baseline =
our hashes/s/chip divided by 1e6.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: the remote-compile tunnel is slow and variable,
# so cache compiled executables across bench runs
os.makedirs("/tmp/tendermintx_tpu_jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tendermintx_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from tendermintx_tpu.ops import poseidon
from tendermintx_tpu.ops.goldilocks import GF

BASELINE_HASHES_PER_S = 1.0e6  # plonky2 Poseidon, one CPU core (proxy)


def bench_poseidon(batch: int = 1 << 15, iters: int = 64, reps: int = 3) -> float:
    """Returns permutations/s on one chip.

    Inputs vary per rep (the remote-execution relay can short-circuit
    byte-identical repeat launches), and iters amortizes the ~30 ms launch
    overhead of the tunnel."""

    import numpy as np

    @jax.jit
    def run(states: GF):
        def body(_, s):
            return poseidon.permute(s)

        out = jax.lax.fori_loop(0, iters, body, states)
        # reduce to a scalar checksum: timing via full-buffer host fetch
        # stalls on the tunnel, and block_until_ready alone is unreliable
        # through the relay — a 4-byte host fetch is the ground truth
        return jnp.sum(out.lo, dtype=jnp.uint32) + jnp.sum(out.hi, dtype=jnp.uint32)

    def make_states(seed: int) -> GF:
        return GF(
            jnp.arange(batch * 12, dtype=jnp.uint32).reshape(batch, 12) + seed,
            jnp.zeros((batch, 12), jnp.uint32),
        )

    int(np.asarray(run(make_states(0))))  # warmup/compile + sync
    times = []
    for r in range(reps):
        s = make_states(r + 1)
        t0 = time.perf_counter()
        int(np.asarray(run(s)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return batch * iters / times[len(times) // 2]


def main():
    hashes_per_s = bench_poseidon()
    print(
        json.dumps(
            {
                "metric": "poseidon_hashes_per_s_per_chip",
                "value": round(hashes_per_s, 1),
                "unit": "hashes/s",
                "vs_baseline": round(hashes_per_s / BASELINE_HASHES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
