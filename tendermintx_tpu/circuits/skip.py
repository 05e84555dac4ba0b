"""Skip circuit: prove a distant header given a trusted header.

Equivalent of the reference's circuits/skip.rs: `skip()` (:28-59),
`SkipOffchainInputs` (:61-102), and `SkipCircuit::define` IO (:119-133).
Public input is abi.encodePacked(uint64 trusted_block, bytes32
trusted_header_hash, uint64 target_block); output is bytes32 target_header.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..inputs.fetcher import InputDataFetcher
from .config import TendermintConfig
from .variables import pack_skip_witness
from .verify import chain_id_leaf_const, skip_verify_jit


def encode_skip_input(
    trusted_block: int, trusted_header_hash: bytes, target_block: int
) -> bytes:
    assert len(trusted_header_hash) == 32
    return (
        trusted_block.to_bytes(8, "big")
        + trusted_header_hash
        + target_block.to_bytes(8, "big")
    )


def decode_skip_input(data: bytes) -> tuple[int, bytes, int]:
    assert len(data) == 48, f"skip input must be 48 bytes, got {len(data)}"
    return (
        int.from_bytes(data[:8], "big"),
        data[8:40],
        int.from_bytes(data[40:48], "big"),
    )


class SkipCircuit:
    """One skip proof: (trusted_block, trusted_header, target_block) ->
    target_header."""

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
        trusted_block, trusted_hash, target_block = decode_skip_input(input_bytes)
        inputs = self.fetcher.get_skip_inputs(
            trusted_block, trusted_hash, target_block, self.max_validators
        )
        witness = pack_skip_witness(inputs)
        valid, target_header = skip_verify_jit(
            witness,
            jnp.asarray(np.frombuffer(trusted_hash, dtype=np.uint8)),
            jnp.uint32(trusted_block & 0xFFFFFFFF),
            jnp.uint32(trusted_block >> 32),
            jnp.uint32(target_block & 0xFFFFFFFF),
            jnp.uint32(target_block >> 32),
            self._cid_leaf,
            self._cid_len,
            skip_max=self.config.skip_max,
        )
        if not bool(valid):
            raise ValueError(
                f"skip verification failed for {trusted_block} -> {target_block}"
            )
        return bytes(np.asarray(target_header))

    def run_with_proof(self, input_bytes: bytes, stark_config=None):
        """run() plus a STARK proof of the target validator-leaf hashing.
        Returns (output_bytes, LeafProofBundle)."""
        from .proving import prove_validator_leaves

        trusted_block, trusted_hash, target_block = decode_skip_input(input_bytes)
        inputs = self.fetcher.get_skip_inputs(
            trusted_block, trusted_hash, target_block, self.max_validators
        )
        out = self.run(input_bytes)
        bundle = prove_validator_leaves(
            inputs.target_block_validators, stark_config
        )
        return out, bundle
