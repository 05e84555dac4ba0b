"""Proof (de)serialization: StarkProof/FriProof <-> JSON-compatible dicts.

Completes the artifact story (SURVEY.md N12): circuit artifacts serialize
via jax.export (runtime/artifact.py), proofs serialize here. Field elements
are decimal strings (64-bit ints exceed JSON's safe-integer range in other
tooling); digests are 4-element lists.
"""

from __future__ import annotations

import json

from ..ops.goldilocks import P
from .fri import FriProof
from .prover import StarkProof


def _ints(xs):
    return [str(int(v)) for v in xs]


def _felt(v) -> int:
    """Range-validated field element — malformed proofs fail HERE, at
    deserialization, not deep inside the verifier (ADVICE r1: don't rely on
    asserts over proof-derived values)."""
    x = int(v)
    if not 0 <= x < P:
        raise ValueError(f"field element out of range: {x}")
    return x


def _unints(xs):
    return [_felt(v) for v in xs]


def _ext(v):
    return [str(int(v[0])), str(int(v[1]))]


def _unext(v):
    return (_felt(v[0]), _felt(v[1]))


def fri_proof_to_dict(p: FriProof) -> dict:
    return {
        "pow_nonce": str(int(p.pow_nonce)),
        "layer_roots": [_ints(r) for r in p.layer_roots],
        "final_poly": [_ext(c) for c in p.final_poly],
        "query_rounds": [
            [
                {
                    "val_i": _ext(vi),
                    "val_j": _ext(vj),
                    "path_i": [_ints(s) for s in pi],
                    "path_j": [_ints(s) for s in pj],
                }
                for (vi, vj, pi, pj) in per_layer
            ]
            for per_layer in p.query_rounds
        ],
    }


def fri_proof_from_dict(d: dict) -> FriProof:
    return FriProof(
        pow_nonce=_felt(d.get("pow_nonce", 0)),
        layer_roots=[_unints(r) for r in d["layer_roots"]],
        final_poly=[_unext(c) for c in d["final_poly"]],
        query_rounds=[
            [
                (
                    _unext(q["val_i"]),
                    _unext(q["val_j"]),
                    [_unints(s) for s in q["path_i"]],
                    [_unints(s) for s in q["path_j"]],
                )
                for q in per_layer
            ]
            for per_layer in d["query_rounds"]
        ],
    )


def stark_proof_to_dict(p: StarkProof) -> dict:
    return {
        "version": 2,
        "n_rows": p.n_rows,
        "public_inputs": _ints(p.public_inputs),
        "trace_root": _ints(p.trace_root),
        "aux_root": _ints(p.aux_root) if p.aux_root is not None else None,
        "quotient_root": _ints(p.quotient_root),
        "ood_trace": [[_ext(v) for v in per] for per in p.ood_trace],
        "ood_quotient": [_ext(v) for v in p.ood_quotient],
        "fri": fri_proof_to_dict(p.fri_proof),
        "openings": {
            str(idx): {
                "trace_row": _ints(trow),
                "trace_path": [_ints(s) for s in tpath],
                "aux_row": _ints(arow),
                "aux_path": [_ints(s) for s in apath],
                "quot_row": _ints(qrow),
                "quot_path": [_ints(s) for s in qpath],
            }
            for idx, (trow, tpath, arow, apath, qrow, qpath) in p.openings.items()
        },
    }


def stark_proof_from_dict(d: dict) -> StarkProof:
    aux_root = d.get("aux_root")
    return StarkProof(
        n_rows=int(d["n_rows"]),
        public_inputs=_unints(d["public_inputs"]),
        trace_root=_unints(d["trace_root"]),
        quotient_root=_unints(d["quotient_root"]),
        ood_trace=[[_unext(v) for v in per] for per in d["ood_trace"]],
        ood_quotient=[_unext(v) for v in d["ood_quotient"]],
        fri_proof=fri_proof_from_dict(d["fri"]),
        openings={
            int(k): (
                _unints(v["trace_row"]),
                [_unints(s) for s in v["trace_path"]],
                _unints(v.get("aux_row", [])),
                [_unints(s) for s in v.get("aux_path", [])],
                _unints(v["quot_row"]),
                [_unints(s) for s in v["quot_path"]],
            )
            for k, v in d["openings"].items()
        },
        aux_root=_unints(aux_root) if aux_root is not None else None,
    )


def proof_to_json(p: StarkProof) -> str:
    return json.dumps(stark_proof_to_dict(p))


def proof_from_json(s: str) -> StarkProof:
    return stark_proof_from_dict(json.loads(s))
