"""Ethereum signer: RFC 6979 / secp256k1 / RLP / EIP-155 known vectors."""

import hashlib

from tendermintx_tpu.runtime.signer import (
    ecdsa_sign,
    ecdsa_verify,
    private_to_address,
    rlp_encode,
    sign_legacy_tx,
    _GX,
    _GY,
    _pt_mul,
)
from tendermintx_tpu.utils.keccak import keccak256


def test_rfc6979_known_vector():
    # classic secp256k1 vector: priv=1, SHA-256("Satoshi Nakamoto")
    h = hashlib.sha256(b"Satoshi Nakamoto").digest()
    r, s, rec = ecdsa_sign(1, h)
    assert r == 0x934B1EA10A4B3C1757E2B0C017D0B6143CE3C9A7E6A4A49860D7A6AB210EE3D8
    assert s == 0x2442CE9D2B916064108014783E923EC36B49743E2FFA1C4496F01A512AAFD9E5
    assert ecdsa_verify((_GX, _GY), h, r, s)
    assert not ecdsa_verify((_GX, _GY), h, r, s + 1)


def test_sign_verify_roundtrip_random_keys():
    for priv in (2, 0xDEADBEEF, 2**200 + 12345):
        pub = _pt_mul(priv, (_GX, _GY))
        h = hashlib.sha256(str(priv).encode()).digest()
        r, s, _ = ecdsa_sign(priv, h)
        assert ecdsa_verify(pub, h, r, s)
        assert not ecdsa_verify(pub, hashlib.sha256(b"other").digest(), r, s)


def test_eth_address_derivation():
    # EIP-155 example key
    priv = 0x4646464646464646464646464646464646464646464646464646464646464646
    assert (
        private_to_address(priv).lower()
        == "0x9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f"
    )


def test_rlp_encoding():
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(b"\x01") == b"\x01"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode([]) == b"\xc0"
    long = b"a" * 56
    assert rlp_encode(long) == b"\xb8\x38" + long


def test_eip155_example_transaction():
    """The worked example from EIP-155 itself: nonce 9, 20 gwei, 21000 gas,
    1 ether to 0x3535...35, chain id 1, key 0x4646...46."""
    priv = 0x4646464646464646464646464646464646464646464646464646464646464646
    unsigned = [9, 20 * 10**9, 21000, bytes([0x35] * 20), 10**18, b"", 1, 0, 0]
    assert keccak256(rlp_encode(unsigned)).hex() == (
        "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"
    )
    raw = sign_legacy_tx(
        priv,
        nonce=9,
        gas_price=20 * 10**9,
        gas=21000,
        to="0x3535353535353535353535353535353535353535",
        value=10**18,
        data=b"",
        chain_id=1,
    )
    assert raw.hex() == (
        "f86c098504a817c800825208943535353535353535353535353535353535353535880"
        "de0b6b3a76400008025a028ef61340bd939bc2195fe537567866003e1a15d3c71ff63"
        "e1590620aa636276a067cbe9d8997f761aecb703304b3800ccf555c9f3dc64214b297"
        "fb1966a3b6d83"
    )


def test_submitter_builds_valid_tx(monkeypatch):
    """EthSubmitter against a mock RPC: the raw tx decodes to the intended
    call with a recoverable signature."""
    from tendermintx_tpu.runtime.signer import EthSubmitter

    sent = {}

    class MockClient:
        def call(self, method, params):
            if method == "eth_getTransactionCount":
                return "0x5"
            if method == "eth_gasPrice":
                return "0x3b9aca00"
            if method == "eth_sendRawTransaction":
                sent["raw"] = params[0]
                return "0x" + "ab" * 32
            raise AssertionError(method)

    sub = EthSubmitter(MockClient(), "0x" + "11" * 32, chain_id=5)
    tx = sub.submit("0x" + "22" * 20, "0xdeadbeef")
    assert tx == "0x" + "ab" * 32
    raw = bytes.fromhex(sent["raw"].removeprefix("0x"))
    assert raw[0] >= 0xF7  # RLP list
    assert b"\xde\xad\xbe\xef" in raw
