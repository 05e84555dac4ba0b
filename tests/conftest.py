"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote-TPU PJRT plugin and forces
``jax_platforms`` to it, overriding the JAX_PLATFORMS env var. Device->host
transfers through that tunnel stall for tens of seconds, so tests must
re-override the config to the local CPU backend *after* importing jax but
before any computation. Real-TPU benchmarking happens in bench.py, which does
not import this.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: STARK quotient/DEEP graphs are large and
# recompile per (AIR, shape); cache across test runs
os.makedirs("/tmp/tendermintx_tpu_jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tendermintx_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
