"""Multi-phase commitment + LogUp range-check argument.

Toy AIR: a few witness columns whose every value must lie in [0, 2^bits),
proven via the aux-commitment lookup. Exercises the full two-phase prover
(challenge sampling between commitments, aux tree, combined OOD/DEEP) and
rejects out-of-range witnesses and tampered aux commitments.
"""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark.air import Air
from tendermintx_tpu.stark.lookup import RangeLookup
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.verifier import verify

CFG = StarkConfig(rate_bits=2, n_queries=16, final_poly_len=8)


class ToyRangeAir(Air):
    constraint_degree = 5  # lookup batch of 4
    frame_offsets = [0, 1]
    n_public = 0

    def __init__(self, n_rows: int, table_bits: int = 6, n_value_cols: int = 3):
        self.n_rows_cfg = n_rows
        self.lookup = RangeLookup(
            checked_cols=list(range(n_value_cols)),
            mult_base=n_value_cols,
            n_rows=n_rows,
            table_bits=table_bits,
        )
        self.n_cols = n_value_cols + self.lookup.width
        self.lookup.aux_base = self.n_cols
        self.n_aux_cols = self.lookup.n_aux_cols
        self.n_challenges = 1

    def cache_key(self):
        return (
            self.n_rows_cfg,
            self.lookup.table_bits,
            len(self.lookup.checked_cols),
        )

    def periodic_columns(self):
        return self.lookup.table_patterns()

    def aux_columns(self, trace, challenges, publics):
        return self.lookup.build_aux(trace, challenges[0])

    def eval_cyclic(self, frame, alg):
        return self.lookup.eval_lookup(frame, alg, periodic_base=0)[0]

    def eval_first(self, frame, alg):
        return self.lookup.eval_lookup(frame, alg, periodic_base=0)[1]

    def eval_transition(self, frame, alg):
        return self.lookup.eval_lookup(frame, alg, periodic_base=0)[2]

    def eval_last(self, frame, alg):
        return self.lookup.eval_lookup(frame, alg, periodic_base=0)[3]


def _build_trace(air: ToyRangeAir, values: np.ndarray):
    mult = air.lookup.multiplicity_columns(values)
    cols = np.concatenate([values, mult], axis=0).astype(object)
    return GF.from_ints(cols)


def _mk(n_rows=64, table_bits=6, seed=0, n_value_cols=3):
    air = ToyRangeAir(n_rows, table_bits, n_value_cols)
    rng = np.random.default_rng(seed)
    values = rng.integers(0, 1 << table_bits, size=(n_value_cols, n_rows)).astype(
        np.uint32
    )
    return air, values


def test_lookup_roundtrip():
    air, values = _mk()
    proof = prove(air, _build_trace(air, values), [], CFG)
    assert proof.aux_cap is not None
    assert verify(air, proof, CFG)


def test_lookup_wide_table():
    # table larger than the trace: column-major split into width-2 tables
    air, values = _mk(n_rows=32, table_bits=6, seed=1)
    assert air.lookup.width == 2
    proof = prove(air, _build_trace(air, values), [], CFG)
    assert verify(air, proof, CFG)


def test_lookup_rejects_out_of_range():
    air, values = _mk(seed=2)
    bad = values.copy()
    bad[0, 5] = 1 << 6  # out of range
    mult = air.lookup.multiplicity_columns(values)  # honest-shaped mults
    cols = np.concatenate([bad, mult], axis=0).astype(object)
    proof = prove(air, GF.from_ints(cols), [], CFG)
    assert not verify(air, proof, CFG)


def test_lookup_rejects_forged_multiplicity():
    air, values = _mk(seed=3)
    mult = air.lookup.multiplicity_columns(values)
    mult[0, 0] += 1  # claim an extra table hit
    cols = np.concatenate([values, mult], axis=0).astype(object)
    proof = prove(air, GF.from_ints(cols), [], CFG)
    assert not verify(air, proof, CFG)


def test_lookup_rejects_tampered_aux_root():
    air, values = _mk(seed=4)
    proof = prove(air, _build_trace(air, values), [], CFG)
    bad = copy.deepcopy(proof)
    bad.aux_cap[0][0] = (bad.aux_cap[0][0] + 1) % P
    assert not verify(air, bad, CFG)


def test_lookup_stacked_path_roundtrip():
    # 4 contiguous checked columns -> the vectorized (block-constraint) path
    air, values = _mk(seed=5, n_value_cols=4)
    assert air.lookup._contiguous
    proof = prove(air, _build_trace(air, values), [], CFG)
    assert verify(air, proof, CFG)
    bad = values.copy()
    bad[2, 9] = 1 << 6
    mult = air.lookup.multiplicity_columns(values)
    cols = np.concatenate([bad, mult], axis=0).astype(object)
    p2 = prove(air, GF.from_ints(cols), [], CFG)
    assert not verify(air, p2, CFG)
