"""Solidity source consistency without a compiler.

No solc exists in this environment (documented in COVERAGE.md), so instead
of forge tests these check the invariants that rot silently: the function
surface the operator calls (selectors from utils/keccak must match the
source), the constants shared between Solidity and Python (SKIP_MAX,
CALLBACK_GAS_LIMIT), and the packed input encodings the contract forwards
to the gateway (reference contracts/test/TendermintX.t.sol:14-33 prints
exactly these encodings)."""

import os
import re

from tendermintx_tpu.circuits.config import TendermintConfig
from tendermintx_tpu.circuits.skip import decode_skip_input, encode_skip_input
from tendermintx_tpu.circuits.step import decode_step_input, encode_step_input
from tendermintx_tpu.utils.keccak import keccak256, selector

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "contracts", "src")


def _source(name: str) -> str:
    with open(os.path.join(SRC, name)) as f:
        return f.read()


def _signatures(sol: str) -> dict[str, str]:
    """function name -> canonical signature, for external/public functions."""
    out = {}
    for m in re.finditer(
        r"function\s+(\w+)\s*\(([^)]*)\)\s*(external|public)", sol
    ):
        name, params = m.group(1), m.group(2)
        types = []
        for p in params.split(","):
            p = p.strip()
            if not p:
                continue
            t = p.split()[0]
            types.append({"uint": "uint256", "int": "int256"}.get(t, t))
        out[name] = f"{name}({','.join(types)})"
    return out


def test_operator_selectors_match_contract_surface():
    sol = _source("TendermintX.sol")
    sigs = _signatures(sol)
    # functions the operator/read-path relies on
    assert sigs["getHeaderHash"] == "getHeaderHash(uint64)"
    assert sigs["requestStep"] == "requestStep()"
    assert sigs["requestSkip"] == "requestSkip(uint64)"
    assert sigs["step"] == "step(uint64)"
    assert sigs["skip"] == "skip(uint64,uint64)"
    # auto-generated getters for public storage read by the operator
    assert "uint64 public latestBlock" in sol
    assert "mapping(uint64 => bytes32) public blockHeightToHeaderHash" in sol
    from tendermintx_tpu.runtime.operator import (
        HEADER_HASH_SELECTOR,
        LATEST_BLOCK_SELECTOR,
    )

    assert LATEST_BLOCK_SELECTOR == selector("latestBlock()")
    assert HEADER_HASH_SELECTOR == selector("blockHeightToHeaderHash(uint64)")
    # keccak oracle: well-known selector vector
    assert keccak256(b"").hex().startswith("c5d24601")


def test_constants_match_python_config():
    sol = _source("TendermintX.sol")
    m = re.search(r"SKIP_MAX = (\d+)", sol)
    assert m and int(m.group(1)) == TendermintConfig(chain_id="x").skip_max
    m = re.search(r"CALLBACK_GAS_LIMIT = (\d+)", sol)
    assert m and int(m.group(1)) == 500_000  # reference TendermintX.sol:82


def test_interfaces_are_implemented():
    sol = _source("TendermintX.sol")
    iface = _signatures(_source(os.path.join("interfaces", "ITendermintX.sol")))
    impl = _signatures(sol)
    for name, sig in iface.items():
        assert impl.get(name) == sig, f"{sig} missing from TendermintX.sol"


def test_packed_encodings_match_contract_layout():
    """The contract forwards abi.encodePacked(latestBlock, latestHeader[,
    targetBlock]) to the gateway (reference TendermintX.sol:61-114; its
    forge test prints the same) — our codecs must produce that layout."""
    h = bytes(range(32))
    enc = encode_step_input(7, h)
    assert enc == (7).to_bytes(8, "big") + h
    assert decode_step_input(enc) == (7, h)
    enc = encode_skip_input(7, h, 1234)
    assert enc == (7).to_bytes(8, "big") + h + (1234).to_bytes(8, "big")
    assert decode_skip_input(enc) == (7, h, 1234)
    # the Solidity side emits the same packing
    sol = _source("TendermintX.sol")
    assert "abi.encodePacked(latestBlock, trustedHeader, targetBlock)" in sol
    assert "abi.encodePacked(trustedBlock, trustedHeader)" in sol
