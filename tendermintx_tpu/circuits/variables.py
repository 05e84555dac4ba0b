"""Typed witness schema: host dataclasses of device arrays.

Equivalent of the reference's circuits/variables.rs (derive(CircuitVariable)
structs :17-120): each *Variable struct there becomes a pytree of arrays
here, with `pack_*` constructors replacing the generated ValueType
conversions.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from ..inputs.conversion import ValidatorData, ValidatorHashField, signature_lanes
from ..inputs.fetcher import SkipInputs, StepInputs
from ..inputs.tendermint import MerkleProof, get_path_indices
from ..ops import ed25519
from .consts import (
    HEADER_PROOF_DEPTH,
    VALIDATOR_BYTE_LENGTH_MAX,
    VALIDATOR_MESSAGE_BYTES_LENGTH_MAX,
)


def _register(cls):
    """Register a dataclass of arrays as a jax pytree (incl. jax.export
    serialization, so witness pytrees can cross artifact boundaries)."""
    names = [f.name for f in fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: ([getattr(obj, n) for n in names], None),
        lambda aux, children: cls(**dict(zip(names, children))),
    )
    jax.export.register_pytree_node_serialization(
        cls,
        serialized_name=f"tendermintx_tpu.{cls.__name__}",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
    )
    return cls


def _u8(x):
    return jnp.asarray(np.asarray(x, dtype=np.uint8))


def _u32(x):
    return jnp.asarray(np.asarray(x, dtype=np.uint32))


def _split64(vals: list[int]):
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


@_register
@dataclass
class ValidatorLanes:
    """Batched ValidatorVariable (reference variables.rs:69-79) plus the
    pre-computed Ed25519 ladder inputs."""

    pubkeys: jnp.ndarray  # (B, 32) u8
    messages: jnp.ndarray  # (B, 124) u8
    msg_len: jnp.ndarray  # (B,) u32
    vp_lo: jnp.ndarray  # (B,) u32
    vp_hi: jnp.ndarray  # (B,) u32
    leaf_bytes: jnp.ndarray  # (B, 47) u8: 0x00 ‖ SimpleValidator encoding
    leaf_len: jnp.ndarray  # (B,) u32
    signed: jnp.ndarray  # (B,) bool
    enabled: jnp.ndarray  # (B,) bool
    # Ed25519 Straus inputs (conditional lanes already substituted). The
    # verification program re-derives/validates ALL of these on device from
    # the raw bytes below (ops/ed25519.bind_witness), so they are unbound
    # witness hints only in the sense that a wrong value fails verification.
    table_x: jnp.ndarray
    table_y: jnp.ndarray
    table_t: jnp.ndarray
    bits2: jnp.ndarray
    rx: jnp.ndarray
    ry: jnp.ndarray
    # Raw signature/pubkey bytes the binding checks derive from. sig_pubkeys
    # is the key each lane's signature verifies under: the validator's own
    # key for signed lanes (enforced on device), the dummy key otherwise.
    sig_r: jnp.ndarray  # (B, 32) u8
    sig_s: jnp.ndarray  # (B, 32) u8
    sig_pubkeys: jnp.ndarray  # (B, 32) u8
    k_q: jnp.ndarray  # (B, 20) u32 mod-L quotient witness


def pack_validator_lanes(lanes: list[ValidatorData]) -> ValidatorLanes:
    B = len(lanes)
    pks, msgs, sigs = signature_lanes(lanes)
    table_x, table_y, table_t, bits2, rx, ry = ed25519.prepare_batch(pks, msgs, sigs)
    sig_r, sig_s, sig_pk, k_q = ed25519.prepare_binding(pks, msgs, sigs)
    leaf = np.zeros((B, 1 + VALIDATOR_BYTE_LENGTH_MAX), dtype=np.uint8)
    leaf_len = np.zeros((B,), dtype=np.uint32)
    msg_arr = np.zeros((B, VALIDATOR_MESSAGE_BYTES_LENGTH_MAX), dtype=np.uint8)
    for i, l in enumerate(lanes):
        from ..inputs.tendermint import Validator

        enc = Validator(
            address=b"", pubkey=l.pubkey, voting_power=l.voting_power
        ).simple_encode()
        assert len(enc) == l.validator_byte_length
        leaf[i, 0] = 0x00
        leaf[i, 1 : 1 + len(enc)] = np.frombuffer(enc, dtype=np.uint8)
        leaf_len[i] = 1 + len(enc)
        msg_arr[i] = np.frombuffer(l.message, dtype=np.uint8)
    vp_lo, vp_hi = _split64([l.voting_power for l in lanes])
    return ValidatorLanes(
        pubkeys=_u8(np.stack([np.frombuffer(l.pubkey, dtype=np.uint8) for l in lanes])),
        messages=_u8(msg_arr),
        msg_len=_u32([l.message_byte_length for l in lanes]),
        vp_lo=vp_lo,
        vp_hi=vp_hi,
        leaf_bytes=_u8(leaf),
        leaf_len=_u32(leaf_len),
        signed=jnp.asarray([l.signed for l in lanes]),
        enabled=jnp.asarray([l.enabled for l in lanes]),
        table_x=table_x,
        table_y=table_y,
        table_t=table_t,
        bits2=bits2,
        rx=rx,
        ry=ry,
        sig_r=sig_r,
        sig_s=sig_s,
        sig_pubkeys=sig_pk,
        k_q=k_q,
    )


@_register
@dataclass
class HashFieldLanes:
    """Batched ValidatorHashFieldVariable (reference variables.rs:82-88)."""

    pubkeys: jnp.ndarray  # (B, 32)
    vp_lo: jnp.ndarray
    vp_hi: jnp.ndarray
    leaf_bytes: jnp.ndarray
    leaf_len: jnp.ndarray
    enabled: jnp.ndarray


def pack_hash_field_lanes(fields_: list[ValidatorHashField]) -> HashFieldLanes:
    B = len(fields_)
    leaf = np.zeros((B, 1 + VALIDATOR_BYTE_LENGTH_MAX), dtype=np.uint8)
    leaf_len = np.zeros((B,), dtype=np.uint32)
    for i, l in enumerate(fields_):
        from ..inputs.tendermint import Validator

        enc = Validator(
            address=b"", pubkey=l.pubkey, voting_power=l.voting_power
        ).simple_encode()
        leaf[i, 1 : 1 + len(enc)] = np.frombuffer(enc, dtype=np.uint8)
        leaf_len[i] = 1 + len(enc)
    vp_lo, vp_hi = _split64([l.voting_power for l in fields_])
    return HashFieldLanes(
        pubkeys=_u8(
            np.stack([np.frombuffer(l.pubkey, dtype=np.uint8) for l in fields_])
        ),
        vp_lo=vp_lo,
        vp_hi=vp_hi,
        leaf_bytes=_u8(leaf),
        leaf_len=_u32(leaf_len),
        enabled=jnp.asarray([l.enabled for l in fields_]),
    )


@_register
@dataclass
class HeaderProof:
    """One header-field inclusion proof (reference variables.rs:58-62)."""

    leaf_bytes: jnp.ndarray  # (1, 73) u8 zero-padded
    leaf_len: jnp.ndarray  # (1,)
    aunts: jnp.ndarray  # (1, 4, 32)
    path_bits: jnp.ndarray  # (1, 4) u32


def pack_header_proof(leaf: bytes, proof: MerkleProof) -> HeaderProof:
    assert len(proof.aunts) == HEADER_PROOF_DEPTH
    width = 73  # 0x00 prefix + largest header leaf (block id, 72 bytes)
    data = np.zeros((1, width), dtype=np.uint8)
    full = b"\x00" + leaf
    data[0, : len(full)] = np.frombuffer(full, dtype=np.uint8)
    bits = get_path_indices(proof.index, proof.total)
    return HeaderProof(
        leaf_bytes=_u8(data),
        leaf_len=_u32([len(full)]),
        aunts=_u8(
            np.stack([np.frombuffer(a, dtype=np.uint8) for a in proof.aunts])[None]
        ),
        path_bits=_u32([[1 if b else 0 for b in bits]]),
    )


@_register
@dataclass
class StepWitness:
    """Device form of VerifyStepVariable (reference variables.rs:107-120)."""

    lanes: ValidatorLanes
    nb_validators: jnp.ndarray  # () u32
    round: jnp.ndarray  # () u32
    next_header: jnp.ndarray  # (32,) u8
    chain_id_proof: HeaderProof
    height_proof: HeaderProof
    validators_hash_proof: HeaderProof
    last_block_id_proof: HeaderProof
    prev_nvh_proof: HeaderProof  # against prev header


def pack_step_witness(inputs: StepInputs) -> StepWitness:
    return StepWitness(
        lanes=pack_validator_lanes(inputs.next_block_validators),
        nb_validators=_u32(inputs.nb_validators),
        round=_u32(inputs.round),
        next_header=_u8(np.frombuffer(inputs.next_header, dtype=np.uint8)),
        chain_id_proof=pack_header_proof(
            inputs.next_header_chain_id_leaf, inputs.next_header_chain_id_proof
        ),
        height_proof=pack_header_proof(
            inputs.next_header_height_leaf, inputs.next_header_height_proof
        ),
        validators_hash_proof=pack_header_proof(
            inputs.next_header_validators_hash_leaf,
            inputs.next_header_validators_hash_proof,
        ),
        last_block_id_proof=pack_header_proof(
            inputs.next_header_last_block_id_leaf,
            inputs.next_header_last_block_id_proof,
        ),
        prev_nvh_proof=pack_header_proof(
            inputs.prev_header_next_validators_hash_leaf,
            inputs.prev_header_next_validators_hash_proof,
        ),
    )


@_register
@dataclass
class SkipWitness:
    """Device form of VerifySkipVariable (reference variables.rs:91-105)."""

    lanes: ValidatorLanes
    nb_target_validators: jnp.ndarray
    target_round: jnp.ndarray
    target_header: jnp.ndarray
    chain_id_proof: HeaderProof
    height_proof: HeaderProof
    validators_hash_proof: HeaderProof
    trusted_lanes: HashFieldLanes
    nb_trusted_validators: jnp.ndarray
    trusted_vh_proof: HeaderProof


def pack_skip_witness(inputs: SkipInputs) -> SkipWitness:
    return SkipWitness(
        lanes=pack_validator_lanes(inputs.target_block_validators),
        nb_target_validators=_u32(inputs.nb_target_validators),
        target_round=_u32(inputs.target_round),
        target_header=_u8(np.frombuffer(inputs.target_header, dtype=np.uint8)),
        chain_id_proof=pack_header_proof(
            inputs.target_header_chain_id_leaf, inputs.target_header_chain_id_proof
        ),
        height_proof=pack_header_proof(
            inputs.target_header_height_leaf, inputs.target_header_height_proof
        ),
        validators_hash_proof=pack_header_proof(
            inputs.target_header_validators_hash_leaf,
            inputs.target_header_validators_hash_proof,
        ),
        trusted_lanes=pack_hash_field_lanes(
            inputs.trusted_header_validators_hash_fields
        ),
        nb_trusted_validators=_u32(inputs.nb_trusted_validators),
        trusted_vh_proof=pack_header_proof(
            inputs.trusted_header_validators_hash_leaf,
            inputs.trusted_header_validators_hash_proof,
        ),
    )
