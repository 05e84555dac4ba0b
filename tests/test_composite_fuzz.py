"""Composite-proof deserialization/verification robustness (fast tier).

Contract (ADVICE r1/r2, VERDICT r2 weak #5): a malformed composite proof
must fail CLEANLY — `CompositeProof.from_dict` may raise
ValueError/KeyError/TypeError at the boundary, and
`verify_{skip,step}_composite` must return None, never raise — so a
structurally broken proof file is indistinguishable from a
cryptographically invalid one all the way through cmd_verify and the
service result path. These tests fabricate structurally plausible (but
cryptographically meaningless) proof dicts and stress-mutate them; the
slow-tier end-to-end tests additionally fuzz a VALID serialized proof
(tests/test_composite.py::test_skip_composite_end_to_end).
"""

from __future__ import annotations

import random

from tendermintx_tpu.circuits.composite import (
    CompositeProof,
    verify_skip_composite,
    verify_step_composite,
)
from tendermintx_tpu.circuits.hashing import HashBundle

DESER_EXC = (ValueError, KeyError, TypeError, AttributeError, IndexError)


def _fake_stark_dict(n_pub: int = 25, n_cols: int = 3) -> dict:
    digest = ["1", "2", "3", "4"]
    return {
        "version": 2,
        "n_rows": 64,
        "public_inputs": [str(i + 1) for i in range(n_pub)],
        "trace_root": digest,
        "aux_root": None,
        "quotient_root": digest,
        "ood_trace": [[["5", "6"]] * n_cols, [["7", "8"]] * n_cols],
        "ood_quotient": [["9", "10"]],
        "fri": {
            "pow_nonce": "0",
            "layer_roots": [digest],
            "final_poly": [["1", "0"]],
            "query_rounds": [
                [
                    {
                        "val_i": ["1", "2"],
                        "val_j": ["3", "4"],
                        "path_i": [digest],
                        "path_j": [digest],
                    }
                ]
            ],
        },
        "openings": {
            "7": {
                "trace_row": ["1"] * n_cols,
                "trace_path": [digest],
                "aux_row": [],
                "aux_path": [],
                "quot_row": ["1", "2"],
                "quot_path": [digest],
            }
        },
    }


def _fake_composite_dict(kind: str = "skip") -> dict:
    abi = "00" * (48 if kind == "skip" else 40)
    return {
        "kind": f"{kind}-composite",
        "version": 1,
        "abi_inputs": abi,
        "abi_output": "11" * 32,
        "round": 0,
        "hash_bundle": {
            "kind": f"{kind}-hashes",
            "n_segments": 32,
            "nb": 2,
            "nb_trusted": 2,
            "proof": _fake_stark_dict(),
        },
        "ed_proof": _fake_stark_dict(),
        "n_ed_segments": 2,
        "signers": [
            {"index": 0, "message": "22" * 100, "signature": "33" * 64},
            {"index": 1, "message": "22" * 100, "signature": "33" * 64},
        ],
        "sha512_proof": _fake_stark_dict(),
        "n_sha512_blocks": 4,
    }


def _leaf_paths(obj, prefix=()):
    """Every path to a scalar leaf, plus every (path, key/index) that can
    be dropped."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _leaf_paths(v, prefix + (k,))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _leaf_paths(v, prefix + (i,))
    else:
        yield prefix


def _set_path(obj, path, value):
    for k in path[:-1]:
        obj = obj[k]
    obj[path[-1]] = value


def _del_path(obj, path):
    for k in path[:-1]:
        obj = obj[k]
    del obj[path[-1]]


MUTANTS = [None, "zz", -1, str((1 << 64) - (1 << 32) + 1), 1 << 70, [], {}]


def fuzz_composite_dict(base: dict, verify_fn, rng: random.Random, n: int):
    """Mutate up to n sampled leaf paths; each mutant must either fail
    deserialization with a clean exception or verify to None."""
    import json

    blob = json.dumps(base)  # fast per-mutant copies (dicts are JSON-plain)
    paths = list(_leaf_paths(base))
    rng.shuffle(paths)
    # every path once if budget allows, else a sample
    for path in paths[:n]:
        for mutant in rng.sample(MUTANTS, 3) + ["__drop__"]:
            d = json.loads(blob)
            if mutant == "__drop__":
                _del_path(d, path)
            else:
                _set_path(d, path, mutant)
            try:
                proof = CompositeProof.from_dict(d)
            except DESER_EXC:
                continue  # clean rejection at the boundary
            out = verify_fn(proof)
            assert out is None, f"mutation at {path} -> {mutant!r} accepted"


def test_fabricated_skip_dict_never_raises():
    base = _fake_composite_dict("skip")
    # the unmutated fake parses but must verify to None (fake crypto)
    proof = CompositeProof.from_dict(base)
    assert verify_skip_composite(proof, "test-chain", 100) is None
    fuzz_composite_dict(
        base,
        lambda p: verify_skip_composite(p, "test-chain", 100),
        random.Random(7),
        n=120,
    )


def test_fabricated_step_dict_never_raises():
    base = _fake_composite_dict("step")
    proof = CompositeProof.from_dict(base)
    assert verify_step_composite(proof, "test-chain") is None
    fuzz_composite_dict(
        base,
        lambda p: verify_step_composite(p, "test-chain"),
        random.Random(11),
        n=120,
    )


def test_hash_bundle_from_dict_rejects_cleanly():
    good = {
        "kind": "skip-hashes",
        "n_segments": 32,
        "nb": 2,
        "nb_trusted": 2,
        "proof": _fake_stark_dict(),
    }
    HashBundle.from_dict(good)
    for bad in [
        {**good, "kind": "skip"},
        {**good, "kind": 5},
        {**good, "n_segments": "x"},
        {k: v for k, v in good.items() if k != "proof"},
    ]:
        try:
            HashBundle.from_dict(bad)
        except DESER_EXC:
            continue
        raise AssertionError(f"malformed bundle accepted: {bad.get('kind')}")


def test_composite_from_dict_kind_validation():
    d = _fake_composite_dict("skip")
    d["kind"] = "skip"  # missing suffix
    try:
        CompositeProof.from_dict(d)
    except ValueError:
        pass
    else:
        raise AssertionError("bad kind accepted")


def test_wrong_kind_for_verifier_returns_none():
    skip = CompositeProof.from_dict(_fake_composite_dict("skip"))
    step = CompositeProof.from_dict(_fake_composite_dict("step"))
    assert verify_step_composite(skip, "test-chain") is None
    assert verify_skip_composite(step, "test-chain", 100) is None


def test_plan_inner_rejects_two_free_sides():
    import pytest

    from tendermintx_tpu.circuits.hashing import Plan

    plan = Plan()
    j = plan.data(1)
    plan.inner(("job", j), ("free",))  # one free side: fine
    plan.inner(("free",), ("job", j))
    with pytest.raises(ValueError):
        plan.inner(("free",), ("free",))
