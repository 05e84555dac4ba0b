"""Benchmark driver: prints one cumulative JSON line per completed step.

The round harness keeps the LAST parseable line, so the record survives a
driver SIGKILL losing only the in-flight step (VERDICT r4 next-step #1).
Three layers of indestructibility:

  1. every completed measurement re-prints the full cumulative record;
  2. each phase runs in a worker thread under a hard timeout — a relay
     hang is recorded in extras as `<phase>_timeout_s` and the bench moves
     on (the zombie thread is abandoned; jax device waits release the GIL);
  3. a global deadline watchdog emits the record and exits rc=0 at
     TMX_BENCH_BUDGET - 30 s no matter what the main thread is stuck in.

Runs on whatever accelerator JAX finds (real TPU under the driver; set
JAX_PLATFORMS=cpu to force CPU). Metrics, deepest first:

  * skip_composite_n128_seconds — warm END-TO-END composite skip proof at
    the Celestia-scale shape (BASELINE.md north star, target < 60 s).
  * skip_composite_n32_seconds — warm composite skip at the dev shape.
  * wrap_seconds / wrapped_verify_seconds / wrapped_proof_gz_bytes — the
    recursion wrapper at the production config (stark/recursion.py).
  * leaf_stark_128_seconds, poseidon/ntt/merkle kernel throughputs.

vs_baseline for proof latencies = 300 s (the reference's published 4-10
min mid-range, /root/reference/README.md:90) divided by our seconds.
TMX_BENCH_BUDGET sets the wall budget in seconds (default 3600);
TMX_BENCH_N the dev-shape validator count (default 32); TMX_BENCH_N128=0
skips the Celestia-scale phase; TMX_BENCH_WRAP=0 skips the wrapper.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

# The remote-TPU relay can be hard-down in two ways: device init hangs, or
# (round 4's failure) jax.devices() succeeds but the FIRST real computation
# hangs forever. Probe both in a subprocess with a timeout before touching
# jax in this process; fall back to CPU so the bench always reports data.
if os.environ.get("TMX_BENCH_BACKEND") is None:
    _probe = (
        "import jax, jax.numpy as jnp;"
        "print(int(jax.jit(lambda x: (x + 1).sum())(jnp.arange(8))))"
    )
    # two spaced attempts: the relay's outage mode is often transient
    # (observed 2026-08-20: a probe failure followed by a healthy 1.4 s
    # first op minutes later), and a false CPU fallback costs the whole
    # record its accelerator numbers
    for _attempt in (1, 2):
        try:
            subprocess.run(
                [sys.executable, "-c", _probe],
                check=True,
                timeout=420,
                capture_output=True,
            )
            os.environ["TMX_BENCH_BACKEND"] = "accel"
            break
        except Exception:  # noqa: BLE001 — hang or init error
            if _attempt == 1:
                import time as _time

                _time.sleep(60)
                continue
            os.environ["TMX_BENCH_BACKEND"] = "cpu-fallback"
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

# any cpu* value forces the local CPU backend (the environment's
# sitecustomize force-registers the remote-TPU platform over JAX_PLATFORMS,
# so the config must be re-overridden after import)
if os.environ.get("TMX_BENCH_BACKEND", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the remote-compile tunnel is slow and variable,
# so cache compiled executables across bench runs
os.makedirs("/tmp/tendermintx_tpu_jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tendermintx_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from tendermintx_tpu.ops import poseidon
from tendermintx_tpu.ops.goldilocks import GF

BASELINE_HASHES_PER_S = 1.0e6  # plonky2 Poseidon, one CPU core (proxy)
BASELINE_PROOF_SECONDS = 300.0  # reference skip proof: 4-10 min published

BUDGET = float(os.environ.get("TMX_BENCH_BUDGET", "3600"))
_START = time.time()

EXTRAS: dict = {}
_EMIT_LOCK = threading.Lock()


def _left() -> float:
    return BUDGET - (time.time() - _START)


# (metric key in EXTRAS, unit, baseline mode) — deepest first. The primary
# line always reports the deepest metric measured so far.
_PRIORITY = [
    ("skip_composite_n128_seconds", "s", "proof"),
    ("skip_composite_n128_cold_seconds", "s", "proof"),
    ("skip_composite_n32_seconds", "s", "proof"),
    ("skip_composite_n32_cold_seconds", "s", "proof"),
    ("leaf_stark_128_seconds", "s", "proof"),
    ("poseidon_hashes_per_s", "hashes/s", "poseidon"),
]


def _emit() -> None:
    """Print the full cumulative record as one JSON line (thread-safe)."""
    primary = None
    for key, unit, mode in _PRIORITY:
        # the dev shape may run at a non-default N
        for k in ([key] if "n32" not in key else [key, key.replace("n32", f"n{_N}")]):
            if k in EXTRAS:
                v = EXTRAS[k]
                vs = (
                    round(BASELINE_PROOF_SECONDS / v, 2)
                    if mode == "proof" and v
                    else round(v / BASELINE_HASHES_PER_S, 3)
                )
                name = k if mode == "proof" else "poseidon_hashes_per_s_per_chip"
                primary = {"metric": name, "value": v, "unit": unit, "vs_baseline": vs}
                break
        if primary:
            break
    if primary is None:
        primary = {"metric": "bench_failed", "value": 0, "unit": "", "vs_baseline": 0}
    EXTRAS["backend"] = os.environ.get("TMX_BENCH_BACKEND", "accel")
    EXTRAS["elapsed_s"] = round(time.time() - _START, 0)
    primary["extras"] = dict(EXTRAS)
    with _EMIT_LOCK:
        print(json.dumps(primary), flush=True)


_N = int(os.environ.get("TMX_BENCH_N", "32"))


def _phase(name: str, cap: float, fn) -> bool:
    """Run fn() in a worker thread under min(cap, budget-left) seconds.

    Returns True iff the phase completed without error. A timeout or an
    exception is recorded in EXTRAS and the cumulative record re-emitted;
    on timeout the worker is abandoned (jax device waits hold no GIL, so
    the main thread keeps going — if the relay is hard-down later phases
    time out too, each leaving a record)."""
    if _left() < 90:
        EXTRAS[f"{name}_skipped"] = "budget"
        return False
    timeout = min(cap, max(_left() - 60, 30))
    outcome: dict = {}

    def work():
        try:
            fn()
            outcome["ok"] = True
        except Exception as e:  # noqa: BLE001 — recorded, bench moves on
            outcome["error"] = repr(e)[:300]

    t = threading.Thread(target=work, daemon=True, name=f"bench-{name}")
    t.start()
    t.join(timeout)
    if t.is_alive():
        EXTRAS[f"{name}_timeout_s"] = round(timeout)
        _emit()
        return False
    if "error" in outcome:
        EXTRAS[f"{name}_error"] = outcome["error"]
        _emit()
        return False
    _emit()
    return True


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


def bench_poseidon_pallas(batch: int = 1 << 15, iters: int = 16, reps: int = 3):
    """Pallas-kernel permutation throughput, or None if the backend can't
    run Mosaic custom calls (the XLA path stays the default either way)."""
    import numpy as np

    from tendermintx_tpu.ops import poseidon_pallas as pp

    if not pp.available():
        return None

    @jax.jit
    def run(states: GF):
        def body(_, s):
            return pp.permute_lanes(s)

        out = jax.lax.fori_loop(0, iters, body, states)
        return jnp.sum(out.lo, dtype=jnp.uint32) + jnp.sum(out.hi, dtype=jnp.uint32)

    def make(seed: int) -> GF:
        lo = jnp.arange(12 * batch, dtype=jnp.uint32).reshape(12, batch) + seed
        return GF(lo, jnp.zeros_like(lo))

    int(np.asarray(run(make(0))))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(run(make(r + 1))))
        times.append(time.perf_counter() - t0)
    times.sort()
    return batch * iters / times[len(times) // 2]


def bench_ntt(cols: int = 64, log_n: int = 16, rate_bits: int = 3, reps: int = 3) -> float:
    """Batched iNTT + coset LDE throughput, field elements/s (input side)."""
    import numpy as np

    from tendermintx_tpu.ops import ntt as nttmod

    n = 1 << log_n

    @jax.jit
    def run(x: GF):
        coeffs = nttmod.intt(x)
        lde = nttmod.coset_lde(coeffs, rate_bits, 7)
        return jnp.sum(lde.lo, dtype=jnp.uint32) + jnp.sum(lde.hi, dtype=jnp.uint32)

    def make(seed: int) -> GF:
        lo = jnp.arange(cols * n, dtype=jnp.uint32).reshape(cols, n) + seed
        return GF(lo, jnp.zeros_like(lo))

    int(np.asarray(run(make(0))))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(run(make(r + 1))))
        times.append(time.perf_counter() - t0)
    times.sort()
    return cols * n / times[len(times) // 2]


def bench_merkle(log_leaves: int = 15, width: int = 64, reps: int = 3) -> float:
    """Poseidon Merkle commit throughput, leaves/s (device tree build)."""
    from tendermintx_tpu.ops.merkle import MerkleTree

    n = 1 << log_leaves

    def make(seed: int) -> GF:
        lo = (
            jnp.arange(n * width, dtype=jnp.uint32).reshape(n, width)
            + seed
        )
        return GF(lo, jnp.zeros_like(lo))

    MerkleTree.build(make(0)).root  # compile + sync
    times = []
    for r in range(reps):
        rows = make(r + 1)
        t0 = time.perf_counter()
        MerkleTree.build(rows).root  # root fetch = 4-element sync
        times.append(time.perf_counter() - t0)
    times.sort()
    return n / times[len(times) // 2]


def bench_leaf_stark(lanes: int = 128) -> float:
    """End-to-end 128-lane validator-leaf SHA-256 STARK: prove+verify s."""
    from tendermintx_tpu.circuits.proving import (
        prove_validator_leaves,
        verify_leaf_bundle,
    )
    from tendermintx_tpu.inputs.conversion import get_validator_data_from_block
    from tendermintx_tpu.inputs.testchain import TestChain

    chain = TestChain(n_validators=lanes, chain_id="bench-chain")
    h = chain.extend()
    lanes_data = get_validator_data_from_block(
        chain.val_set, chain.commits[h], chain.chain_id, lanes
    )
    t0 = time.perf_counter()
    bundle = prove_validator_leaves(lanes_data)
    assert verify_leaf_bundle(bundle, lanes_data)
    return time.perf_counter() - t0


class _CompositeBench:
    """Composite skip at one validator-set size, emitting after every
    sub-step so a mid-phase kill loses only the in-flight measurement."""

    def __init__(self, n_validators: int):
        import tempfile

        from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
        from tendermintx_tpu.inputs.testchain import TestChain

        self.n = n_validators
        self.chain = TestChain(n_validators=n_validators, chain_id="bench-chain")
        for _ in range(8):
            self.chain.extend()
        tmp = tempfile.mkdtemp(prefix="bench_fixtures_")
        self.chain.write_fixtures(tmp)
        self.fetcher = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
        self.last_proof = None

    def _run(self, trusted_h: int, target_h: int) -> float:
        from tendermintx_tpu.circuits.composite import (
            prove_skip_composite,
            verify_skip_composite,
        )

        trusted = self.chain.headers[trusted_h].hash()
        inputs = self.fetcher.get_skip_inputs(
            trusted_h, trusted, target_h, max_validators=self.n
        )
        t0 = time.perf_counter()
        proof = prove_skip_composite(trusted_h, trusted, target_h, inputs)
        out = verify_skip_composite(proof, "bench-chain", 100_800)
        dt = time.perf_counter() - t0
        assert out is not None, "composite skip proof failed to verify"
        self.last_proof = proof
        self.last_out = out
        return dt

    def cold(self) -> None:
        from tendermintx_tpu.circuits.composite import DEFAULT_COMPOSITE_CONFIG

        dt = self._run(1, 5)
        EXTRAS[f"skip_composite_n{self.n}_cold_seconds"] = round(dt, 1)
        EXTRAS[f"composite_n{self.n}_proof_bytes"] = len(
            json.dumps(self.last_proof.to_dict())
        )
        EXTRAS["security_bits"] = DEFAULT_COMPOSITE_CONFIG.fri.security_bits

    def warm(self) -> None:
        dt = self._run(2, 6)
        EXTRAS[f"skip_composite_n{self.n}_seconds"] = round(dt, 1)
        cold = EXTRAS.get(f"skip_composite_n{self.n}_cold_seconds")
        if cold is not None:
            # sanity: a warm run that beats cold means every compiled
            # shape was reused (VERDICT r2 weak #2)
            EXTRAS[f"n{self.n}_warm_lt_cold"] = bool(dt < cold)

    def wrap(self) -> None:
        """Recursion wrapper (stark/recursion.py) at the production
        config: one proof replaces all Merkle openings + FRI query
        rounds. Timed separately so wrapper compiles never pollute the
        base warm number (the wrap of the most recent proof)."""
        from tendermintx_tpu.circuits.composite import (
            verify_skip_composite,
            wrap_composite,
        )

        assert self.last_proof is not None
        t0 = time.perf_counter()
        wrapped = wrap_composite(self.last_proof)
        EXTRAS[f"n{self.n}_wrap_seconds"] = round(time.perf_counter() - t0, 1)
        _emit()
        t0 = time.perf_counter()
        wout = verify_skip_composite(wrapped, "bench-chain", 100_800)
        EXTRAS[f"n{self.n}_wrapped_verify_seconds"] = round(
            time.perf_counter() - t0, 1
        )
        assert wout == self.last_out, "wrapped composite failed to verify"
        EXTRAS[f"n{self.n}_wrapped_proof_bytes"] = len(
            json.dumps(wrapped.to_dict())
        )
        EXTRAS[f"n{self.n}_wrapped_proof_gz_bytes"] = len(wrapped.to_bytes())


def _composite_group(n: int, do_wrap: bool) -> None:
    """cold -> warm -> wrap phases for one validator-set size."""
    cb = _CompositeBench(n)
    if _phase(f"composite_n{n}_cold", 2100 if n >= 100 else 1500, cb.cold):
        _phase(f"composite_n{n}_warm", 600, cb.warm)
        if do_wrap:
            # first wrap pays WrapAir + EvalAir compiles (recursion
            # phase B1 doubled the wrap batch)
            _phase(f"composite_n{n}_wrap", 1500, cb.wrap)


def _run_group_subprocess(n: int, budget: float) -> None:
    """Run one composite group in a FRESH bench process with its own HBM:
    the N=128 statement set needs most of the 16 GB chip, and a process
    that already holds earlier phases' device allocations OOMs it
    (BENCH round-5 first run: RESOURCE_EXHAUSTED). The child re-emits the
    cumulative record per phase; the parent merges the LAST parseable
    line's extras, so even a killed child loses only its in-flight step."""
    env = dict(os.environ)
    env["TMX_BENCH_ONLY"] = str(n)
    env["TMX_BENCH_BUDGET"] = str(int(budget))
    merged = {"any": False}
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        )
    except Exception as e:  # noqa: BLE001
        EXTRAS[f"composite_n{n}_group_error"] = repr(e)[:300]
        _emit()
        return

    # stream the child's per-phase emits LIVE into the parent record: a
    # driver kill of the parent mid-group must cost only the child's
    # in-flight phase, not its whole group
    def reader():
        for line in proc.stdout:
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if isinstance(parsed, dict) and isinstance(parsed.get("extras"), dict):
                merged["any"] = True
                for k, v in parsed["extras"].items():
                    if k not in ("backend", "elapsed_s"):
                        EXTRAS[k] = v
                _emit()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        proc.wait(timeout=budget + 120)
    except subprocess.TimeoutExpired:
        proc.kill()
        EXTRAS[f"composite_n{n}_group_timeout_s"] = round(budget + 120)
    t.join(15)
    if not merged["any"]:
        EXTRAS[f"composite_n{n}_group_no_record"] = True
    _emit()


def main():
    # Global deadline: whatever the main thread is stuck in, the record is
    # emitted and the process exits rc=0 before the driver's kill window.
    def _deadline():
        EXTRAS["deadline_exit"] = True
        _emit()
        os._exit(0)

    killer = threading.Timer(max(BUDGET - 30, 60), _deadline)
    killer.daemon = True
    killer.start()

    do_wrap = bool(int(os.environ.get("TMX_BENCH_WRAP", "1")))

    # child mode: one composite group only (fresh-HBM isolation)
    only = os.environ.get("TMX_BENCH_ONLY")
    if only:
        _composite_group(int(only), do_wrap)
        _emit()
        os._exit(0)

    # Probe the Pallas kernel EAGERLY before anything traces: inside jit
    # the probe defers (ops/poseidon_pallas.available), so without this
    # the first traced permute would silently pin the XLA path.
    from tendermintx_tpu.ops import poseidon_pallas as _pp

    def kernels():
        hps = bench_poseidon()
        EXTRAS["poseidon_hashes_per_s"] = round(hps, 1)

    def pallas():
        hps_p = bench_poseidon_pallas()
        if hps_p is not None:
            EXTRAS["pallas_poseidon_hashes_per_s"] = round(hps_p, 1)
        # Record availability + the probe's failure reason either way, so
        # the record says whether the Pallas kernel actually ran on this
        # backend or the product path fell back to XLA (VERDICT r3 #1).
        EXTRAS["pallas_available"] = bool(_pp.available())
        if _pp.probe_error is not None:
            EXTRAS["pallas_probe_error"] = _pp.probe_error[:300]

    # caps sized to the observed relay latency: a trivial first op can
    # take 130 s to compile through the tunnel (measured 2026-08-20)
    _phase("pallas_probe", 420, _pp.available)
    _phase("poseidon", 600, kernels)
    _phase("pallas", 420, pallas)
    _phase("ntt", 420, lambda: EXTRAS.__setitem__("ntt_felts_per_s", round(bench_ntt(), 1)))
    _phase("merkle", 420, lambda: EXTRAS.__setitem__("merkle_leaves_per_s", round(bench_merkle(), 1)))

    # Composite groups run in FRESH child processes (their own HBM — see
    # _run_group_subprocess). Each group: cold (every per-process XLA
    # compile), warm (a SECOND height with all programs compiled — the
    # steady-state latency of a long-running prover, the deployment shape:
    # `serve` keeps one process resident, and the reference's own 4-10 min
    # figure is likewise a warm hosted service, README.md:90), then wrap.
    #
    # The north-star N=128 shape (beyond the reference's N=100 production
    # max, /root/reference/circuits/consts.rs:4; BASELINE.md target) runs
    # FIRST with the larger budget share: if the relay is slow, the
    # headline metric must be the one that survives (VERDICT r3 #2).
    n128_on = bool(int(os.environ.get("TMX_BENCH_N128", "1")))
    if n128_on:
        if _left() > 600:
            b128 = _left() - 60
            # leave the dev-shape group ~1/3 of the remainder
            b128 = min(b128, max(_left() * 0.62, _left() - 1500))
            _run_group_subprocess(128, b128)
        else:
            EXTRAS["composite_n128_skipped"] = "budget"

    if _left() > 300:
        _run_group_subprocess(_N, _left() - 60)
    else:
        EXTRAS[f"composite_n{_N}_skipped"] = "budget"

    # leaf STARK last: its compiled shapes are mostly disjoint from the
    # composite's, so it must never eat budget the north star needs
    _phase(
        "leaf_stark",
        700,
        lambda: EXTRAS.__setitem__("leaf_stark_128_seconds", round(bench_leaf_stark(), 1)),
    )

    _emit()
    # exit WITHOUT interpreter teardown: an abandoned (timed-out) phase
    # thread stuck inside an XLA call can SIGABRT during teardown, and the
    # record is already printed
    os._exit(0)


if __name__ == "__main__":
    main()
