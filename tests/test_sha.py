"""Batched SHA-256/512 kernels vs hashlib oracle."""

import hashlib

import numpy as np

from tendermintx_tpu.ops import sha256, sha512

rng = np.random.default_rng(13)


def rand_msgs(lengths):
    return [bytes(rng.integers(0, 256, size=l, dtype=np.uint8)) for l in lengths]


def test_sha256_matches_hashlib():
    lengths = [0, 1, 3, 47, 55, 56, 63, 64, 65, 100, 124, 127, 128, 200]
    msgs = rand_msgs(lengths)
    got = sha256.sha256_many(msgs)
    want = [hashlib.sha256(m).digest() for m in msgs]
    assert got == want


def test_sha256_fixed_nblocks_padding():
    # shorter messages hashed inside a wider fixed-block layout
    msgs = rand_msgs([5, 20, 46])
    got = sha256.sha256_many(msgs, n_blocks=4)
    want = [hashlib.sha256(m).digest() for m in msgs]
    assert got == want


def test_sha256_known_vectors():
    assert sha256.sha256_many([b""])[0].hex() == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert sha256.sha256_many([b"abc"])[0].hex() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )


def test_sha512_matches_hashlib():
    lengths = [0, 1, 3, 64, 111, 112, 127, 128, 129, 200, 300]
    msgs = rand_msgs(lengths)
    got = sha512.sha512_many(msgs)
    want = [hashlib.sha512(m).digest() for m in msgs]
    assert got == want


def test_sha512_known_vector():
    assert sha512.sha512_many([b"abc"])[0].hex() == (
        "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"
    )
