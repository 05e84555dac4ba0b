"""EvalAir: in-circuit OOD constraint evaluation (stark/evalair.py).

Fast tier: tape recording/execution semantics, the EvalAir STARK
round-trip on a toy statement, and rejection of wrong inputs. The real
composite statements run through the wrapped slow tier
(tests/test_composite_wrapped.py) and bench.py.
"""

import numpy as np
import pytest

from tendermintx_tpu.ops.ext import ext_add, ext_mul, ext_sub
from tendermintx_tpu.ops.goldilocks import GF, P
from tendermintx_tpu.stark.air import Air
from tendermintx_tpu.stark.challenger import Challenger
from tendermintx_tpu.stark.evalair import (
    EvalAir,
    RecAlg,
    assemble_inputs,
    build_tape,
    execute_tape,
    tape_for,
)
from tendermintx_tpu.stark.prover import StarkConfig, prove
from tendermintx_tpu.stark.verifier import (
    ood_identity,
    replay_statement,
    verify,
)


class FibAir(Air):
    n_cols = 2
    n_public = 3
    constraint_degree = 3

    def eval_transition(self, frame, alg):
        a, b = frame.local
        a_n, b_n = frame.next
        return [a_n - b, b_n - (a + b)]

    def eval_first(self, frame, alg):
        a, b = frame.local
        return [a - frame.public[0], b - frame.public[1]]

    def eval_last(self, frame, alg):
        _, b = frame.local
        return [b - frame.public[2]]


def _fib_trace(n_rows, a0=1, b0=1):
    rows = [[a0, b0]]
    for _ in range(n_rows - 1):
        a, b = rows[-1]
        rows.append([b, (a + b) % P])
    return GF.from_ints(np.array(rows, dtype=object).T), rows[-1][1]


CFG = StarkConfig(rate_bits=3, n_queries=8, final_poly_len=8)


def test_rec_alg_semantics():
    """Recorded tape execution computes the same ext arithmetic as the
    host algebra — including MAC/CMAC fusion results."""
    import random

    rng = random.Random(1)
    alg = RecAlg()

    class _T:
        def __init__(s):
            s.alg = alg
            s.stmt = 0

        def inp(s, tag):
            from tendermintx_tpu.stark.evalair import _RecFelt

            f = alg.inp((0,) + tag)
            return f

    t = _T()
    xs = [t.inp(("pub", i)) for i in range(4)]
    # a mix that produces ADD/SUB/MUL/CMUL and fusion opportunities
    y = xs[0] * xs[1] + xs[2]
    y = alg.cmul(7, y) + xs[3]
    y = y - xs[0] * xs[2]
    y = y * y
    want_zero = y - y
    tape = build_tape.__wrapped__(alg, [want_zero.i]) if hasattr(
        build_tape, "__wrapped__"
    ) else None
    from tendermintx_tpu.stark.evalair import _optimize

    tape = _optimize(alg, [want_zero.i])
    vals = [(rng.randrange(P), rng.randrange(P)) for _ in range(4)]
    flat = [c for v in vals for c in v]
    out, av, bv, cv = execute_tape(tape, flat)  # asserts (y - y) == 0

    # recompute the non-asserted value natively and find it among outs
    e = ext_add(ext_mul(vals[0], vals[1]), vals[2])
    e = ext_add(ext_mul((7, 0), e), vals[3])
    e = ext_sub(e, ext_mul(vals[0], vals[2]))
    e = ext_mul(e, e)
    outs = {(int(out[i, 0]), int(out[i, 1])) for i in range(tape.n_ops)}
    assert (e[0] % P, e[1] % P) in outs


def _fib_ctx():
    trace, b_final = _fib_trace(64)
    air = FibAir()
    proof = prove(air, trace, [1, 1, b_final], CFG)
    ch = Challenger()
    ctx = replay_statement(air, proof, CFG, ch, CFG.shift)
    assert ctx is not None
    assert ood_identity(air, proof, ctx)
    return air, proof, ctx


def test_tape_proves_fib_ood_identity():
    """The recorded tape reproduces replay + native identity: executing it
    on the verifier-derived inputs reaches zero at the assert row; a
    tampered input makes execution fail."""
    air, proof, ctx = _fib_ctx()
    tape = tape_for([air])
    inputs = assemble_inputs(tape, [ctx])
    execute_tape(tape, inputs)  # raises if the identity fails

    bad = list(inputs)
    bad[0] = (bad[0] + 1) % P
    with pytest.raises(ValueError):
        execute_tape(tape, bad)


def test_evalair_stark_roundtrip():
    """EvalAir prove + verify over the fib statement's OOD check, and
    rejection when the public inputs (the OOD values etc.) are tampered."""
    air, proof, ctx = _fib_ctx()
    tape = tape_for([air])
    e_air = EvalAir(tape)
    inputs = assemble_inputs(tape, [ctx])
    assert len(inputs) == e_air.n_public
    trace = e_air.witness_trace(inputs)
    assert int(trace.shape[1]) == tape.n_rows
    e_proof = prove(e_air, trace, inputs, CFG)
    assert verify(e_air, e_proof, CFG)

    # tampered publics: the pinned LOAD rows no longer match -> reject
    import copy

    bad = copy.deepcopy(e_proof)
    bad.public_inputs = list(bad.public_inputs)
    bad.public_inputs[0] = (bad.public_inputs[0] + 1) % P
    assert not verify(e_air, bad, CFG)

    # tampered committed value -> reject
    bad2 = copy.deepcopy(e_proof)
    bad2.ood_trace[0][0] = (
        (bad2.ood_trace[0][0][0] + 1) % P,
        bad2.ood_trace[0][0][1],
    )
    assert not verify(e_air, bad2, CFG)


def test_tape_shapes_are_static():
    """Same AIR shape -> same memoized tape object."""
    assert tape_for([FibAir()]) is tape_for([FibAir()])
