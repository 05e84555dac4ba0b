"""One proof object for the whole step/skip statement.

The reference's deliverable is a single SNARK whose public inputs are the
abi.encodePacked circuit IO (`circuit.prove()` at /root/reference/circuits/
step.rs:223, consumed by `ISuccinctGateway.verifiedCall` at
/root/reference/contracts/src/TendermintX.sol:111-114). The TPU-native
equivalent: a CompositeProof — two Fiat–Shamir-chained STARKs plus the
witness exposures that wire them together — whose public IO is exactly

    abi_inputs  = abi.encodePacked(trusted_block, trusted_header[, target])
    abi_output  = target/next header hash (bytes32)

and whose verifier needs ONLY this object (plus the chain config):

  1. The hash STARK (circuits/hashing.py) proves validator leaves →
     dynamic CometBFT Merkle tree → validators_hash → header-field Merkle
     proofs → the trusted/target header hashes, exposing the validator
     SimpleValidator encodings as proven preimages.
  2. The Ed25519 STARK (stark/ed25519_air.py) proves Q = [s]B + [k](−A)
     per signer, exposing (s, k, table, final state) publics the verifier
     pins to each signature: k must equal SHA-512(R‖A‖M) for the exposed
     message M, A must be the pubkey PARSED FROM THE PROVEN LEAF ENCODING,
     and the final state must equal R projectively.
  3. The verifier finishes with the reference's native wiring checks, all
     O(N) integer comparisons over proven data: precommit message contents
     (height/round/header-hash window, validator.rs:81-183), 2/3 voting
     power (voting.rs:66-109), the 1/3 trusted intersection
     (verify.rs:391-437), and the skip distance (verify.rs:508-526).

Transcript chaining: the hash STARK's transcript is seeded with the ABI IO;
the Ed25519 STARK's with the ABI IO plus the hash proof's commitment roots.
Neither sub-proof verifies outside this composite statement.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..inputs.conversion import (
    DUMMY_MESSAGE,
    DUMMY_PUBLIC_KEY,
    DUMMY_SIGNATURE,
)
from ..stark.ed25519_air import (
    PUB_PER_SIG,
    Ed25519Air,
    check_lane_publics,
    ed25519_air_trace,
)
from ..ops.ed25519 import L_ORDER
from ..stark.sha512_air import (
    PUB_PER_SEGMENT as PUB_PER_SHA512_SEGMENT,
    Sha512Air,
    digest_halves_to_bytes,
    pad_message_512,
    schedule_messages_512,
    sha512_batch_trace,
)
from ..stark.prover import StarkConfig, StarkProof, prove
from ..stark.serialize import stark_proof_from_dict, stark_proof_to_dict
from ..stark.verifier import verify
from .hashing import (
    DEFAULT_HASH_CONFIG,
    HashBundle,
    prove_skip_hashes,
    prove_step_hashes,
    verify_skip_hashes,
    verify_step_hashes,
)
from .skip import decode_skip_input, encode_skip_input
from .step import decode_step_input, encode_step_input

DEFAULT_ED_CONFIG = StarkConfig(rate_bits=2, n_queries=28, final_poly_len=64)


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _seed_felts(*parts: bytes, roots: list[list[int]] = ()) -> list[int]:
    data = b"".join(parts)
    data += bytes((-len(data)) % 4)
    out = [int.from_bytes(data[i : i + 4], "big") for i in range(0, len(data), 4)]
    for r in roots:
        out.extend(int(v) for v in r)
    return out


def parse_simple_validator(enc: bytes) -> tuple[bytes, int] | None:
    """Strict SimpleValidator decode: 0a 22 0a 20 <pk32> 10 <varint power>
    (the exact bytes the reference marshals, validator.rs:185-207)."""
    if len(enc) < 37 or enc[:4] != b"\x0a\x22\x0a\x20":
        return None
    pk = enc[4:36]
    if enc[36] != 0x10:
        return None
    v = 0
    shift = 0
    i = 37
    while True:
        if i >= len(enc) or shift > 63:
            return None
        b = enc[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not (b & 0x80):
            break
        shift += 7
    if i != len(enc):
        return None
    if i > 38 and enc[i - 1] == 0:  # non-canonical varint
        return None
    if v >= 1 << 63:
        return None
    return pk, v


def _check_message(msg: bytes, height: int, round_: int, header_hash: bytes) -> bool:
    """Verifier-side mirror of gadgets.message_checks (reference
    validator.rs:81-183): Precommit marker, full sfixed64 height and round,
    header-hash window inside the signed bytes."""
    if not (1 <= len(msg) <= 124):
        return False
    if msg[1:3] != b"\x08\x02":
        return False
    if len(msg) < 12 or int.from_bytes(msg[4:12], "little") != height:
        return False
    off = 16 if round_ == 0 else 25
    if round_ != 0:
        if len(msg) < 21 or msg[12] != 0x19:
            return False
        if int.from_bytes(msg[13:21], "little") != round_:
            return False
    if len(msg) < off + 32:
        return False
    return msg[off : off + 32] == header_hash


def _next_pow2(n: int) -> int:
    # smallest power of two >= n, with _next_pow2(0) == 1 (the naive
    # (n-1).bit_length() gives (-1).bit_length() == 1 for n == 0)
    return 1 << max(n - 1, 0).bit_length()


# ---------------------------------------------------------------------------
# Proof object
# ---------------------------------------------------------------------------


@dataclass
class LaneSig:
    """One signer's exposure: which validator signed, what bytes, and the
    signature the Ed25519 STARK lane covers."""

    index: int
    message: bytes
    signature: bytes


@dataclass
class CompositeProof:
    kind: str  # "skip" | "step"
    abi_inputs: bytes
    abi_output: bytes  # bytes32 target/next header
    round: int
    hash_bundle: HashBundle
    ed_proof: StarkProof
    n_ed_segments: int
    signers: list[LaneSig]
    # Challenge-hash proof: SHA-512 STARK over every signer's k-preimage
    # R ‖ A ‖ M, Fiat–Shamir-chained after the Ed25519 proof. The composite
    # verifier is sound without it (check_lane_publics recomputes the hash
    # natively), but with it the k-derivation is PROVEN — the table the
    # reference proves in-circuit (verify.rs:248-259) — so a constrained
    # (e.g. on-chain) verifier never hashes message bytes itself.
    sha512_proof: StarkProof | None = None
    n_sha512_blocks: int = 0

    def to_dict(self) -> dict:
        return {
            "kind": f"{self.kind}-composite",
            "version": 1,
            "abi_inputs": self.abi_inputs.hex(),
            "abi_output": self.abi_output.hex(),
            "round": self.round,
            "hash_bundle": self.hash_bundle.to_dict(),
            "ed_proof": stark_proof_to_dict(self.ed_proof),
            "n_ed_segments": self.n_ed_segments,
            **(
                {
                    "sha512_proof": stark_proof_to_dict(self.sha512_proof),
                    "n_sha512_blocks": self.n_sha512_blocks,
                }
                if self.sha512_proof is not None
                else {}
            ),
            "signers": [
                {
                    "index": s.index,
                    "message": s.message.hex(),
                    "signature": s.signature.hex(),
                }
                for s in self.signers
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "CompositeProof":
        """Raises ValueError/KeyError/TypeError on malformed input —
        callers treat any deserialization error as a verification failure
        (ADVICE r1/r2 rule: malformed proofs fail cleanly at the boundary,
        never via bare asserts that vanish under ``python -O``)."""
        kind = str(d["kind"])
        if not kind.endswith("-composite"):
            raise ValueError(f"not a composite proof kind: {kind!r}")
        return cls(
            kind=kind[: -len("-composite")],
            abi_inputs=bytes.fromhex(d["abi_inputs"]),
            abi_output=bytes.fromhex(d["abi_output"]),
            round=int(d["round"]),
            hash_bundle=HashBundle.from_dict(d["hash_bundle"]),
            ed_proof=stark_proof_from_dict(d["ed_proof"]),
            n_ed_segments=int(d["n_ed_segments"]),
            sha512_proof=(
                stark_proof_from_dict(d["sha512_proof"])
                if d.get("sha512_proof") is not None
                else None
            ),
            n_sha512_blocks=int(d.get("n_sha512_blocks", 0)),
            signers=[
                LaneSig(
                    index=int(s["index"]),
                    message=bytes.fromhex(s["message"]),
                    signature=bytes.fromhex(s["signature"]),
                )
                for s in d["signers"]
            ],
        )


# ---------------------------------------------------------------------------
# Proving
# ---------------------------------------------------------------------------


def _prove_ed_lanes(
    lanes, nb: int, seed: list[int], ed_config: StarkConfig
) -> tuple[StarkProof, int, list[LaneSig], list[bytes]]:
    signers = []
    pks, msgs, sigs = [], [], []
    for i, l in enumerate(lanes[:nb]):
        if l.signed:
            m = l.message[: l.message_byte_length]
            signers.append(LaneSig(index=i, message=m, signature=l.signature))
            pks.append(l.pubkey)
            msgs.append(m)
            sigs.append(l.signature)
    signer_pks = list(pks)
    B = max(_next_pow2(len(signers)), 1)
    while len(pks) < B:
        pks.append(DUMMY_PUBLIC_KEY)
        msgs.append(DUMMY_MESSAGE)
        sigs.append(DUMMY_SIGNATURE)
    trace, publics = ed25519_air_trace(pks, msgs, sigs)
    proof = prove(Ed25519Air(B), trace, publics, ed_config, transcript_seed=seed)
    return proof, B, signers, signer_pks


def _challenge_blocks(signers: list[LaneSig], signer_pks: list[bytes]):
    """Deterministic SHA-512 block schedule for the signers' challenge
    preimages R ‖ A ‖ M, padded to a power-of-two block count with
    standalone empty-message blocks."""
    msgs = [
        ls.signature[:32] + pk + ls.message
        for ls, pk in zip(signers, signer_pks)
    ]
    blocks, chain, spans = schedule_messages_512(msgs)
    target = max(_next_pow2(len(blocks)), 1)
    while len(blocks) < target:
        blocks.append(pad_message_512(b"")[0])
        chain.append(0)
    return blocks, chain, spans


def _prove_challenge_hashes(
    signers: list[LaneSig],
    signer_pks: list[bytes],
    seed: list[int],
    config: StarkConfig,
) -> tuple[StarkProof | None, int]:
    if not signers:
        return None, 0
    blocks, chain, _ = _challenge_blocks(signers, signer_pks)
    trace, publics = sha512_batch_trace(blocks, chain)
    proof = prove(
        Sha512Air(len(blocks)), trace, publics, config, transcript_seed=seed
    )
    return proof, len(blocks)


def prove_skip_composite(
    trusted_block: int,
    trusted_header: bytes,
    target_block: int,
    inputs,
    hash_config: StarkConfig = DEFAULT_HASH_CONFIG,
    ed_config: StarkConfig = DEFAULT_ED_CONFIG,
) -> CompositeProof:
    """inputs: fetcher.SkipInputs for (trusted_block, target_block)."""
    abi_in = encode_skip_input(trusted_block, trusted_header, target_block)
    abi_out = inputs.target_header
    seed_h = _seed_felts(abi_in, abi_out)
    hb = prove_skip_hashes(inputs, hash_config, transcript_seed=seed_h)
    seed_e = _seed_felts(
        abi_in, abi_out, roots=[hb.proof.trace_root, hb.proof.quotient_root]
    )
    ed_proof, B, signers, signer_pks = _prove_ed_lanes(
        inputs.target_block_validators, inputs.nb_target_validators, seed_e, ed_config
    )
    seed_c = _seed_felts(
        abi_in,
        abi_out,
        roots=[
            hb.proof.trace_root,
            hb.proof.quotient_root,
            ed_proof.trace_root,
            ed_proof.quotient_root,
        ],
    )
    ch_proof, n_blocks = _prove_challenge_hashes(
        signers, signer_pks, seed_c, ed_config
    )
    return CompositeProof(
        kind="skip",
        abi_inputs=abi_in,
        abi_output=abi_out,
        round=inputs.target_round,
        hash_bundle=hb,
        ed_proof=ed_proof,
        n_ed_segments=B,
        signers=signers,
        sha512_proof=ch_proof,
        n_sha512_blocks=n_blocks,
    )


def prove_step_composite(
    prev_block: int,
    prev_header: bytes,
    inputs,
    hash_config: StarkConfig = DEFAULT_HASH_CONFIG,
    ed_config: StarkConfig = DEFAULT_ED_CONFIG,
) -> CompositeProof:
    """inputs: fetcher.StepInputs for prev_block."""
    abi_in = encode_step_input(prev_block, prev_header)
    abi_out = inputs.next_header
    seed_h = _seed_felts(abi_in, abi_out)
    hb = prove_step_hashes(inputs, hash_config, transcript_seed=seed_h)
    seed_e = _seed_felts(
        abi_in, abi_out, roots=[hb.proof.trace_root, hb.proof.quotient_root]
    )
    ed_proof, B, signers, signer_pks = _prove_ed_lanes(
        inputs.next_block_validators, inputs.nb_validators, seed_e, ed_config
    )
    seed_c = _seed_felts(
        abi_in,
        abi_out,
        roots=[
            hb.proof.trace_root,
            hb.proof.quotient_root,
            ed_proof.trace_root,
            ed_proof.quotient_root,
        ],
    )
    ch_proof, n_blocks = _prove_challenge_hashes(
        signers, signer_pks, seed_c, ed_config
    )
    return CompositeProof(
        kind="step",
        abi_inputs=abi_in,
        abi_output=abi_out,
        round=inputs.round,
        hash_bundle=hb,
        ed_proof=ed_proof,
        n_ed_segments=B,
        signers=signers,
        sha512_proof=ch_proof,
        n_sha512_blocks=n_blocks,
    )


# ---------------------------------------------------------------------------
# Verification — needs ONLY the proof object + chain config
# ---------------------------------------------------------------------------


def _verify_common(
    proof: CompositeProof,
    encodings: list[bytes],
    header_hash: bytes,
    height: int,
    hash_roots,
    ed_config: StarkConfig,
):
    """Checks shared by step/skip once the hash facts exist: parse the
    proven validator encodings, verify the Ed25519 STARK lane by lane, run
    the message checks, and compute the 2/3 voting threshold. Returns the
    (pubkey, power) list and the set of signer pubkeys, or None."""
    vals = []
    for enc in encodings:
        parsed = parse_simple_validator(enc)
        if parsed is None:
            return None
        vals.append(parsed)

    if not (0 <= proof.round < (1 << 31)):
        return None
    B = proof.n_ed_segments
    if B < 1 or B & (B - 1) or len(proof.signers) > B:
        return None
    seed_e = _seed_felts(
        proof.abi_inputs, proof.abi_output, roots=list(hash_roots)
    )
    if len(proof.ed_proof.public_inputs) != PUB_PER_SIG * B:
        return None
    if not verify(Ed25519Air(B), proof.ed_proof, ed_config, transcript_seed=seed_e):
        return None

    prev_index = -1
    signer_pks = []
    publics = proof.ed_proof.public_inputs
    for lane, ls in enumerate(proof.signers):
        if not (prev_index < ls.index < len(vals)):
            return None  # indices strictly increasing: no double counting
        prev_index = ls.index
        pk = vals[ls.index][0]
        seg = publics[PUB_PER_SIG * lane : PUB_PER_SIG * (lane + 1)]
        if len(ls.signature) != 64:
            return None
        if not check_lane_publics(seg, pk, ls.message, ls.signature):
            return None
        if not _check_message(ls.message, height, proof.round, header_hash):
            return None
        signer_pks.append(pk)

    total = sum(p for _, p in vals)
    signed_power = sum(vals[ls.index][1] for ls in proof.signers)
    if not signed_power * 3 > total * 2:
        return None

    # Optional challenge-hash proof: when present it must verify against
    # the chained transcript, its message blocks must be exactly the
    # R ‖ A ‖ M preimages this verifier assembles from proven data, and
    # each signer's proven digest must reduce (mod L) to the k scalar the
    # Ed25519 proof used. Presence never weakens soundness (the lane
    # checks above recompute the hash natively); it makes the k-derivation
    # proven, matching the reference's in-circuit SHA-512 table.
    if proof.sha512_proof is not None:
        if not proof.signers:
            return None
        blocks, chain, spans = _challenge_blocks(proof.signers, signer_pks)
        if proof.n_sha512_blocks != len(blocks):
            return None
        seed_c = _seed_felts(
            proof.abi_inputs,
            proof.abi_output,
            roots=list(hash_roots)
            + [proof.ed_proof.trace_root, proof.ed_proof.quotient_root],
        )
        if not verify(
            Sha512Air(len(blocks)),
            proof.sha512_proof,
            ed_config,
            transcript_seed=seed_c,
        ):
            return None
        pubs = proof.sha512_proof.public_inputs
        if len(pubs) != PUB_PER_SHA512_SEGMENT * len(blocks):
            return None
        for s, blk in enumerate(blocks):
            base = PUB_PER_SHA512_SEGMENT * s
            for i in range(16):
                word = int.from_bytes(blk[8 * i : 8 * i + 8], "big")
                if int(pubs[base + 2 * i]) != word & 0xFFFFFFFF:
                    return None
                if int(pubs[base + 2 * i + 1]) != word >> 32:
                    return None
            if int(pubs[base + 48]) != chain[s]:
                return None
        for lane, (first, n_seg) in enumerate(spans):
            last = PUB_PER_SHA512_SEGMENT * (first + n_seg - 1)
            digest = digest_halves_to_bytes(
                [int(v) for v in pubs[last + 32 : last + 48]]
            )
            k = int.from_bytes(digest, "little") % L_ORDER
            seg = publics[PUB_PER_SIG * lane : PUB_PER_SIG * (lane + 1)]
            if any(
                int(seg[20 + i]) != ((k >> (13 * i)) & 0x1FFF)
                for i in range(20)
            ):
                return None

    return vals, set(signer_pks)


_VERIFY_EXC = (
    ValueError,
    AssertionError,
    KeyError,
    IndexError,
    TypeError,
    OverflowError,
    AttributeError,
)


def verify_skip_composite(
    proof: CompositeProof,
    chain_id: str,
    skip_max: int,
    hash_config: StarkConfig = DEFAULT_HASH_CONFIG,
    ed_config: StarkConfig = DEFAULT_ED_CONFIG,
) -> tuple[int, bytes, int, bytes] | None:
    """Returns (trusted_block, trusted_header, target_block, target_header)
    on success, None otherwise — NEVER an exception (a structurally broken
    CompositeProof is indistinguishable from a cryptographically invalid
    one; same contract as stark.verifier.verify). Mirrors reference
    verify_skip (verify.rs:528-563) with every hash/signature fact proven."""
    try:
        return _verify_skip_inner(
            proof, chain_id, skip_max, hash_config, ed_config
        )
    except _VERIFY_EXC:
        return None


def _verify_skip_inner(
    proof: CompositeProof,
    chain_id: str,
    skip_max: int,
    hash_config: StarkConfig,
    ed_config: StarkConfig,
) -> tuple[int, bytes, int, bytes] | None:
    if proof.kind != "skip" or len(proof.abi_inputs) != 48:
        return None
    trusted_block, trusted_header, target_block = decode_skip_input(
        proof.abi_inputs
    )
    target_header = proof.abi_output
    if len(target_header) != 32:
        return None
    # skip distance (verify.rs:508-526)
    if not (trusted_block + 1 < target_block <= trusted_block + skip_max):
        return None

    seed_h = _seed_felts(proof.abi_inputs, proof.abi_output)
    facts = verify_skip_hashes(
        proof.hash_bundle,
        chain_id,
        trusted_header,
        target_header,
        target_block,
        hash_config,
        transcript_seed=seed_h,
    )
    if facts is None:
        return None

    common = _verify_common(
        proof,
        facts.target_encodings,
        target_header,
        target_block,
        (proof.hash_bundle.proof.trace_root, proof.hash_bundle.proof.quotient_root),
        ed_config,
    )
    if common is None:
        return None
    _, signer_pks = common

    # 1/3 intersection over the trusted set (verify.rs:391-437)
    trusted_vals = []
    for enc in facts.trusted_encodings:
        parsed = parse_simple_validator(enc)
        if parsed is None:
            return None
        trusted_vals.append(parsed)
    trusted_total = sum(p for _, p in trusted_vals)
    inter = sum(p for pk, p in trusted_vals if pk in signer_pks)
    if not inter * 3 > trusted_total * 1:
        return None

    return trusted_block, trusted_header, target_block, target_header


def verify_step_composite(
    proof: CompositeProof,
    chain_id: str,
    hash_config: StarkConfig = DEFAULT_HASH_CONFIG,
    ed_config: StarkConfig = DEFAULT_ED_CONFIG,
) -> tuple[int, bytes, bytes] | None:
    """Returns (prev_block, prev_header, next_header) on success, None
    otherwise — NEVER an exception (see verify_skip_composite). Mirrors
    reference verify_step (verify.rs:469-506): full header verification of
    prev+1 plus the prev-hash and next-validators-hash links (both enforced
    inside the hash STARK's statement bindings)."""
    try:
        return _verify_step_inner(proof, chain_id, hash_config, ed_config)
    except _VERIFY_EXC:
        return None


def _verify_step_inner(
    proof: CompositeProof,
    chain_id: str,
    hash_config: StarkConfig,
    ed_config: StarkConfig,
) -> tuple[int, bytes, bytes] | None:
    if proof.kind != "step" or len(proof.abi_inputs) != 40:
        return None
    prev_block, prev_header = decode_step_input(proof.abi_inputs)
    next_header = proof.abi_output
    if len(next_header) != 32:
        return None

    seed_h = _seed_felts(proof.abi_inputs, proof.abi_output)
    facts = verify_step_hashes(
        proof.hash_bundle,
        chain_id,
        prev_header,
        next_header,
        prev_block + 1,
        hash_config,
        transcript_seed=seed_h,
    )
    if facts is None:
        return None

    common = _verify_common(
        proof,
        facts.encodings,
        next_header,
        prev_block + 1,
        (proof.hash_bundle.proof.trace_root, proof.hash_bundle.proof.quotient_root),
        ed_config,
    )
    if common is None:
        return None
    return prev_block, prev_header, next_header
