"""STARK proof production for the Tendermint circuits.

First composition layer between the circuit pipeline and the proving stack:
the validator-leaf hashing of a step/skip verification — the SHA-256 work
the reference delegates to its starkyx gadget (SURVEY.md N5) — is proven as
a batched Sha256Air STARK whose public inputs bind (leaf bytes -> digest)
for every validator lane. `verify_leaf_bundle` checks the proof AND that its
bound messages are exactly the circuit's marshaled validator leaves.

(The remaining composition steps — Merkle tree AIR binding digests to the
validators_hash, and the Ed25519 AIR — are tracked in COVERAGE.md.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..inputs.conversion import ValidatorData
from ..stark.prover import StarkConfig, StarkProof, prove
from ..stark.serialize import stark_proof_from_dict, stark_proof_to_dict
from ..stark.sha256_air import (
    Sha256Air,
    digest_words_to_bytes,
    pad_single_block,
    sha256_batch_trace,
)
from ..stark.verifier import verify


def _leaf_bytes(lane: ValidatorData) -> bytes:
    from ..inputs.tendermint import Validator

    enc = Validator(
        address=b"", pubkey=lane.pubkey, voting_power=lane.voting_power
    ).simple_encode()
    return b"\x00" + enc


@dataclass
class LeafProofBundle:
    """SHA-256 STARK over all validator-leaf hashes of one circuit run."""

    proof: StarkProof
    n_lanes: int

    def to_dict(self) -> dict:
        return {
            "kind": "validator-leaf-sha256",
            "n_lanes": self.n_lanes,
            "proof": stark_proof_to_dict(self.proof),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LeafProofBundle":
        assert d["kind"] == "validator-leaf-sha256"
        return cls(proof=stark_proof_from_dict(d["proof"]), n_lanes=d["n_lanes"])

    def digests(self) -> list[bytes]:
        """The proven leaf digests, one per lane (from the public inputs)."""
        from ..stark.sha256_air import PUB_PER_SEGMENT as PPS

        out = []
        for s in range(self.n_lanes):
            words = [
                int(v)
                for v in self.proof.public_inputs[PPS * s + 16 : PPS * s + 24]
            ]
            out.append(digest_words_to_bytes(words))
        return out


def prove_validator_leaves(
    lanes: list[ValidatorData],
    config: StarkConfig | None = None,
) -> LeafProofBundle:
    """Prove SHA-256(0x00 ‖ SimpleValidator(lane)) for every lane (enabled
    and padding alike — fixed shape keeps one compiled prover per size)."""
    config = config or StarkConfig(rate_bits=2, n_queries=28, final_poly_len=8)
    blocks = [pad_single_block(_leaf_bytes(l)) for l in lanes]
    trace, publics = sha256_batch_trace(blocks)
    air = Sha256Air(len(lanes))
    proof = prove(air, trace, publics, config)
    return LeafProofBundle(proof=proof, n_lanes=len(lanes))


def verify_leaf_bundle(
    bundle: LeafProofBundle,
    lanes: list[ValidatorData],
    config: StarkConfig | None = None,
) -> bool:
    """STARK-verify the bundle and check its bound messages are exactly the
    circuit's validator leaves."""
    config = config or StarkConfig(rate_bits=2, n_queries=28, final_poly_len=8)
    if bundle.n_lanes != len(lanes):
        return False
    air = Sha256Air(bundle.n_lanes)
    if len(bundle.proof.public_inputs) != air.n_public:
        return False
    if not verify(air, bundle.proof, config):
        return False
    # bind: proof message words == the actual leaf bytes of each lane, with
    # every segment starting fresh (single-block leaves never chain)
    from ..stark.sha256_air import PUB_PER_SEGMENT as PPS

    for s, lane in enumerate(lanes):
        block = pad_single_block(_leaf_bytes(lane))
        words = [
            int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)
        ]
        got = [int(v) for v in bundle.proof.public_inputs[PPS * s : PPS * s + 16]]
        if got != words:
            return False
        if int(bundle.proof.public_inputs[PPS * s + 24]) != 0:
            return False
    return True
