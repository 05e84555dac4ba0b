"""Deployment-size composite proof: N=128 validators (slow tier).

The reference tests its Celestia deployment size (N=100,
/root/reference/circuits/skip.rs:287-296, consts.rs:4); BASELINE.md's
north star is a 128-validator skip. This proves the full composite —
128 validator leaves in the hash plan, a 128-lane Ed25519 batch
(2^15 trace rows), the SHA-512 challenge table — at the DEFAULT 100-bit
config, byte-round-trips it, and verifies it standalone.

This is the heaviest test in the tree (tens of minutes on CPU; the warm
TPU number lands in BENCH extras via TMX_BENCH_N=128). Set
TMX_SKIP_N128=1 to skip it on constrained runners.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    os.environ.get("TMX_SKIP_N128") == "1",
    reason="TMX_SKIP_N128=1",
)
def test_skip_composite_n128():
    from tendermintx_tpu.circuits.composite import (
        CompositeProof,
        prove_skip_composite,
        verify_skip_composite,
    )
    from tendermintx_tpu.inputs.fetcher import InputDataFetcher, InputDataMode
    from tendermintx_tpu.inputs.testchain import TestChain

    n = 128
    chain = TestChain(n_validators=n, chain_id="n128-chain")
    for _ in range(5):
        chain.extend()
    tmp = tempfile.mkdtemp(prefix="n128_fixtures_")
    chain.write_fixtures(tmp)
    f = InputDataFetcher(fixture_path=tmp, mode=InputDataMode.FIXTURE)
    trusted = chain.headers[1].hash()
    target = chain.headers[5].hash()
    inputs = f.get_skip_inputs(1, trusted, 5, max_validators=n)
    assert inputs.nb_target_validators == n

    proof = prove_skip_composite(1, trusted, 5, inputs)
    blob = json.dumps(proof.to_dict())
    proof2 = CompositeProof.from_dict(json.loads(blob))
    out = verify_skip_composite(proof2, "n128-chain", 100_800)
    assert out == (1, trusted, 5, target)
    # deployment-scale size on the wire (one batch proof, packed felts)
    assert len(blob) < 4_000_000, f"proof blew up: {len(blob)} bytes"
