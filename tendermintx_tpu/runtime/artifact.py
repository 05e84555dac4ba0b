"""Compiled-circuit artifacts: build once, prove many times.

Equivalent of the reference's build/prove artifact flow
(`Plonky2xFunction::entrypoint()` — bin/step.rs:24, succinct.json:5-15 — and
the serialization registries guarded by `circuit.test_serializers`,
step.rs:156-166; SURVEY.md N11/N12). The artifact is a real compiled
program: the verification computation is traced and exported to portable
StableHLO bytes via jax.export, alongside a JSON manifest of the circuit
parameters. `prove` deserializes and calls it without re-tracing Python.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.config import CELESTIA, MOCHA_4, TendermintConfig
from ..circuits.variables import (
    SkipWitness,
    StepWitness,
    pack_skip_witness,
    pack_step_witness,
)
from ..circuits.verify import chain_id_leaf_const, skip_verify, step_verify
from ..inputs.testchain import TestChain

CHAINS = {"celestia": CELESTIA, "mocha-4": MOCHA_4}

MANIFEST_NAME = "manifest.json"


def _example_witness(circuit: str, max_validators: int):
    """Trace-shape donor: a tiny synthetic chain padded to max_validators."""
    import tempfile

    from ..inputs.fetcher import InputDataFetcher, InputDataMode

    chain = TestChain(n_validators=2, chain_id="artifact-shape")
    for _ in range(3):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="artifact_shapes_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
    if circuit == "step":
        inputs = f.get_step_inputs(1, chain.headers[1].hash(), max_validators)
        return pack_step_witness(inputs)
    inputs = f.get_skip_inputs(1, chain.headers[1].hash(), 4, max_validators)
    return pack_skip_witness(inputs)


def _fn_for(circuit: str, skip_max: int):
    if circuit == "step":

        def fn(w, hash_, lo, hi, cid_leaf, cid_len):
            return step_verify(w, hash_, lo, hi, cid_leaf, cid_len)

        return fn

    def fn(w, hash_, tlo, thi, glo, ghi, cid_leaf, cid_len):
        return skip_verify(
            w, hash_, tlo, thi, glo, ghi, cid_leaf, cid_len, skip_max=skip_max
        )

    return fn


def _scalar_args(circuit: str):
    u8_32 = jnp.zeros((32,), jnp.uint8)
    u32 = jnp.uint32(0)
    cid_leaf = jnp.zeros((73,), jnp.uint8)
    cid_len = jnp.uint32(0)
    if circuit == "step":
        return (u8_32, u32, u32, cid_leaf, cid_len)
    return (u8_32, u32, u32, u32, u32, cid_leaf, cid_len)


@dataclasses.dataclass
class CircuitArtifact:
    circuit: str  # "step" | "skip"
    chain: str
    max_validators: int
    skip_max: int
    exported: "jax.export.Exported"

    def call(self, witness, *scalars):
        return self.exported.call(witness, *scalars)

    def save(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        blob = self.exported.serialize()
        with open(os.path.join(out_dir, f"{self.circuit}.stablehlo"), "wb") as f:
            f.write(blob)
        manifest = {
            "framework": "tendermintx-tpu",
            "version": 1,
            "circuit": self.circuit,
            "chain": self.chain,
            "max_validators": self.max_validators,
            "skip_max": self.skip_max,
        }
        with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=2)

    @classmethod
    def load(cls, out_dir: str, circuit: str | None = None) -> "CircuitArtifact":
        with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
            manifest = json.load(f)
        if circuit is not None and manifest["circuit"] != circuit:
            raise ValueError(
                f"artifact is for {manifest['circuit']}, wanted {circuit}"
            )
        with open(
            os.path.join(out_dir, f"{manifest['circuit']}.stablehlo"), "rb"
        ) as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        return cls(
            circuit=manifest["circuit"],
            chain=manifest["chain"],
            max_validators=manifest["max_validators"],
            skip_max=manifest["skip_max"],
            exported=exported,
        )


def build_artifact(
    circuit: str, chain: str, max_validators: int
) -> CircuitArtifact:
    assert circuit in ("step", "skip")
    config = CHAINS[chain] if chain in CHAINS else TendermintConfig(chain_id=chain)
    witness = _example_witness(circuit, max_validators)
    fn = _fn_for(circuit, config.skip_max)
    exported = jax.export.export(jax.jit(fn))(witness, *_scalar_args(circuit))
    return CircuitArtifact(
        circuit=circuit,
        chain=chain,
        max_validators=max_validators,
        skip_max=config.skip_max,
        exported=exported,
    )
