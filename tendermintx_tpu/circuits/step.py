"""Step circuit: prove the next header given a trusted header.

Equivalent of the reference's circuits/step.rs: the `step()` builder
extension (:26-51), `StepOffchainInputs` async hint (:53-89), and
`StepCircuit::define`'s evm_read/evm_write IO (:106-117). Public input is
abi.encodePacked(uint64 prev_block, bytes32 prev_header_hash); public output
is bytes32 next_header — bit-exact with the reference (SURVEY.md N10).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..inputs.fetcher import InputDataFetcher
from .config import TendermintConfig
from .variables import pack_step_witness
from .verify import chain_id_leaf_const, step_verify_jit


def encode_step_input(prev_block: int, prev_header_hash: bytes) -> bytes:
    assert len(prev_header_hash) == 32
    return prev_block.to_bytes(8, "big") + prev_header_hash


def decode_step_input(data: bytes) -> tuple[int, bytes]:
    assert len(data) == 40, f"step input must be 40 bytes, got {len(data)}"
    return int.from_bytes(data[:8], "big"), data[8:40]


class StepCircuit:
    """One step proof: (prev_block, prev_header_hash) -> next_header."""

    def __init__(
        self,
        max_validators: int,
        config: TendermintConfig,
        fetcher: InputDataFetcher | None = None,
    ):
        self.max_validators = max_validators
        self.config = config
        self.fetcher = fetcher or InputDataFetcher()
        self._cid_leaf, self._cid_len = chain_id_leaf_const(config.chain_id)

    def run(self, input_bytes: bytes) -> bytes:
        """Witness-mode execution: fetch inputs, run the verification
        program on device, return the packed public output."""
        prev_block, prev_hash = decode_step_input(input_bytes)
        inputs = self.fetcher.get_step_inputs(
            prev_block, prev_hash, self.max_validators
        )
        witness = pack_step_witness(inputs)
        valid, next_header = step_verify_jit(
            witness,
            jnp.asarray(np.frombuffer(prev_hash, dtype=np.uint8)),
            jnp.uint32(prev_block & 0xFFFFFFFF),
            jnp.uint32(prev_block >> 32),
            self._cid_leaf,
            self._cid_len,
        )
        if not bool(valid):
            raise ValueError(
                f"step verification failed for block {prev_block + 1}"
            )
        return bytes(np.asarray(next_header))

    def run_with_proof(self, input_bytes: bytes, stark_config=None):
        """run() plus a STARK proof of the validator-leaf hashing.
        Returns (output_bytes, LeafProofBundle)."""
        from .proving import prove_validator_leaves

        prev_block, prev_hash = decode_step_input(input_bytes)
        inputs = self.fetcher.get_step_inputs(
            prev_block, prev_hash, self.max_validators
        )
        out = self.run(input_bytes)
        bundle = prove_validator_leaves(
            inputs.next_block_validators, stark_config
        )
        return out, bundle
