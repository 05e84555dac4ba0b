"""Batched SHA-256 compression AIR: prove B blocks bit-exactly in one trace.

Constraint-side counterpart of the witness kernel in ops/sha256.py and the
TPU-native equivalent of the reference's SHA-256 STARK gadget
(`curta_sha256_variable`, SURVEY.md N5 — starkyx's sha256 table consumed at
/root/reference/circuits/builder/shared.rs:194). B independent compressions
(e.g. all validator leaves of a header) occupy 64-row segments of one trace;
all selectors have period 64, so the same constraints govern every segment.

Per row t of a segment: bits of schedule word w(t) and of the state words
a(t), e(t) produced BY round t (b..d / f..h live on earlier rows, the first
rounds read the IV constants), plus carry bits for the modular additions.
106 columns. Frame offsets {0,1,2,3,4,9,14,16} provide the round recurrence
and 16-deep message-schedule windows.

Public inputs: per segment, 16 message words ‖ 8 digest words. They are
bound through two *public columns* (verifier-interpolated, uncommitted):
pc_a carries message words on rows 0..15 and digest words a..d on rows
60..63; pc_b carries digest words e..h on rows 60..63.
"""

from __future__ import annotations

import numpy as np

from ..ops.goldilocks import GF, P
from ..ops.sha256 import _H0, _K
from .air import Air, Frame

SEGMENT = 64
# column layout
COL_W = 0
COL_A = 32
COL_E = 64
COL_CW = 96  # 2 schedule-carry bits
COL_CE = 98  # 3 new_e carry bits
COL_CA = 101  # 3 new_a carry bits
COL_CDIG_A = 104  # digest carry (a..d side), rows 60..63
COL_CDIG_E = 105  # digest carry (e..h side), rows 60..63
N_COLS = 106

H = [int(x) for x in _H0]
K = [int(x) for x in _K]


def _bits(v: int) -> list[int]:
    return [(v >> i) & 1 for i in range(32)]


class Sha256Air(Air):
    """One or more SHA-256 compressions; construct with the batch size."""

    n_cols = N_COLS
    n_public_cols = 2
    constraint_degree = 4
    frame_offsets = [0, 1, 2, 3, 4, 9, 14, 16]

    def __init__(self, n_blocks: int = 1):
        self.n_blocks = n_blocks
        self.n_public = 24 * n_blocks

    # -- periodic selectors ---------------------------------------------------

    def periodic_columns(self):
        sel_main = [1 if s < 60 else 0 for s in range(SEGMENT)]
        sel_sched = [1 if s < 48 else 0 for s in range(SEGMENT)]
        sel_init = [1 if s == 0 else 0 for s in range(SEGMENT)]
        sel_msg = [1 if s < 16 else 0 for s in range(SEGMENT)]
        sel_dig = [1 if 60 <= s else 0 for s in range(SEGMENT)]
        k_shift = [K[(s + 4) % SEGMENT] for s in range(SEGMENT)]
        h_shift_a = [H[3 - (s - 60)] if s >= 60 else 0 for s in range(SEGMENT)]
        h_shift_e = [H[7 - (s - 60)] if s >= 60 else 0 for s in range(SEGMENT)]
        return [
            sel_main, sel_sched, sel_init, sel_msg, sel_dig,
            k_shift, h_shift_a, h_shift_e,
        ]

    # -- public columns -------------------------------------------------------

    def public_columns(self, publics, n_rows):
        assert n_rows == SEGMENT * self.n_blocks
        pc_a = [0] * n_rows
        pc_b = [0] * n_rows
        for s in range(self.n_blocks):
            base = 24 * s
            msg = publics[base : base + 16]
            digest = publics[base + 16 : base + 24]
            for i in range(16):
                pc_a[SEGMENT * s + i] = msg[i]
            for r in range(4):
                pc_a[SEGMENT * s + 60 + r] = digest[3 - r]
                pc_b[SEGMENT * s + 60 + r] = digest[7 - r]
        return [pc_a, pc_b]

    # -- helpers over the algebra (vectorized: a 32-bit word is one k=32
    # stacked vector, so σ/Σ/ch/maj are single wide array ops) --------------

    WEIGHTS = [1 << i for i in range(32)]

    @classmethod
    def _val(cls, vec, alg):
        return alg.weighted_sum(vec, cls.WEIGHTS)

    @staticmethod
    def _xor2(x, y, alg):
        # x + y - 2xy
        return x + y - alg.vcmul(2, x * y)

    @classmethod
    def _xor3(cls, x, y, z, alg):
        # two chained xor2 (degree 3)
        return cls._xor2(cls._xor2(x, y, alg), z, alg)

    @staticmethod
    def _ch(e, f, g, alg):
        return g + e * (f - g)

    @staticmethod
    def _maj(a, b, c, alg):
        ab = a * b
        return ab + c * (a + b) - alg.vcmul(2, ab * c)

    @classmethod
    def _sigma0_small(cls, v, alg):
        return cls._xor3(alg.rot(v, 7), alg.rot(v, 18), alg.shift_down(v, 3), alg)

    @classmethod
    def _sigma1_small(cls, v, alg):
        return cls._xor3(alg.rot(v, 17), alg.rot(v, 19), alg.shift_down(v, 10), alg)

    @classmethod
    def _Sigma0(cls, v, alg):
        return cls._xor3(alg.rot(v, 2), alg.rot(v, 13), alg.rot(v, 22), alg)

    @classmethod
    def _Sigma1(cls, v, alg):
        return cls._xor3(alg.rot(v, 6), alg.rot(v, 11), alg.rot(v, 25), alg)

    def _cols(self, frame: Frame, offset: int, start: int, count: int, alg):
        return alg.col_range(frame, self.frame_offsets.index(offset), start, count)

    def _felt(self, frame: Frame, offset: int, col: int):
        return frame.at_offset(offset, self)[col]

    def _a_bits(self, frame, m, alg):
        if m < 0:
            return alg.vconst_bits(_bits(H[-1 - m]))
        return self._cols(frame, m, COL_A, 32, alg)

    def _e_bits(self, frame, m, alg):
        if m < 0:
            return alg.vconst_bits(_bits(H[4 + (-1 - m)]))
        return self._cols(frame, m, COL_E, 32, alg)

    # -- constraints ----------------------------------------------------------

    def eval_cyclic(self, frame: Frame, alg):
        (
            sel_main, sel_sched, sel_init, sel_msg, sel_dig,
            k_shift, h_shift_a, h_shift_e,
        ) = frame.periodic
        pc_a, pc_b = frame.public_cols
        out = []

        # 1. booleanity of every column (all are bits): one stacked op
        all_cols = alg.col_range(frame, 0, 0, N_COLS)
        bool_vec = all_cols * all_cols - all_cols
        out.extend(alg.unstack(bool_vec))

        # 2. message binding: rows 0..15 of each segment
        w_val0 = self._val(self._cols(frame, 0, COL_W, 32, alg), alg)
        out.append(sel_msg * (w_val0 - pc_a))

        # 3. schedule recurrence: w(s+16) = σ1(w(s+14)) + w(s+9) +
        #    σ0(w(s+1)) + w(s)  (carries at row s+16)
        w0 = self._cols(frame, 0, COL_W, 32, alg)
        w1 = self._cols(frame, 1, COL_W, 32, alg)
        w9 = self._cols(frame, 9, COL_W, 32, alg)
        w14 = self._cols(frame, 14, COL_W, 32, alg)
        w16 = self._cols(frame, 16, COL_W, 32, alg)
        lhs = (
            self._val(self._sigma1_small(w14, alg), alg)
            + self._val(w9, alg)
            + self._val(self._sigma0_small(w1, alg), alg)
            + self._val(w0, alg)
        )
        carry = self._felt(frame, 16, COL_CW) + alg.cmul(
            2, self._felt(frame, 16, COL_CW + 1)
        )
        out.append(
            sel_sched * (lhs - self._val(w16, alg) - alg.cmul(1 << 32, carry))
        )

        # 4. generic round t = s+4 (anchor s)
        out.extend(
            self._round_constraints(
                frame, alg, sel_main, t_rel=4, k_val=k_shift,
            )
        )

        # 5. initial rounds t = 0..3 (anchor row 0): negative round indices
        #    resolve to the IV constants
        for t in range(4):
            out.extend(
                self._round_constraints(
                    frame, alg, sel_init, t_rel=t, k_val=alg.const(K[t]),
                )
            )

        # 6. digest binding on rows 60..63: H + state word = digest + c*2^32
        a_val0 = self._val(self._cols(frame, 0, COL_A, 32, alg), alg)
        e_val0 = self._val(self._cols(frame, 0, COL_E, 32, alg), alg)
        cdig_a = frame.rows[0][COL_CDIG_A]
        cdig_e = frame.rows[0][COL_CDIG_E]
        out.append(sel_dig * (h_shift_a + a_val0 - pc_a - alg.cmul(1 << 32, cdig_a)))
        out.append(sel_dig * (h_shift_e + e_val0 - pc_b - alg.cmul(1 << 32, cdig_e)))
        return out

    def _round_constraints(self, frame, alg, sel, t_rel, k_val):
        a_in = self._a_bits(frame, t_rel - 1, alg)
        b = self._a_bits(frame, t_rel - 2, alg)
        c = self._a_bits(frame, t_rel - 3, alg)
        d_bits = self._a_bits(frame, t_rel - 4, alg)
        e_in = self._e_bits(frame, t_rel - 1, alg)
        f = self._e_bits(frame, t_rel - 2, alg)
        g = self._e_bits(frame, t_rel - 3, alg)
        h_bits = self._e_bits(frame, t_rel - 4, alg)

        w_bits = self._cols(frame, t_rel, COL_W, 32, alg)
        new_a = self._val(self._cols(frame, t_rel, COL_A, 32, alg), alg)
        new_e = self._val(self._cols(frame, t_rel, COL_E, 32, alg), alg)
        ce = [self._felt(frame, t_rel, COL_CE + j) for j in range(3)]
        ca = [self._felt(frame, t_rel, COL_CA + j) for j in range(3)]

        t1 = (
            self._val(h_bits, alg)
            + self._val(self._Sigma1(e_in, alg), alg)
            + self._val(self._ch(e_in, f, g, alg), alg)
            + k_val
            + self._val(w_bits, alg)
        )
        t2 = self._val(self._Sigma0(a_in, alg), alg) + self._val(
            self._maj(a_in, b, c, alg), alg
        )
        carry_e = ce[0] + alg.cmul(2, ce[1]) + alg.cmul(4, ce[2])
        carry_a = ca[0] + alg.cmul(2, ca[1]) + alg.cmul(4, ca[2])
        c_new_e = self._val(d_bits, alg) + t1 - new_e - alg.cmul(1 << 32, carry_e)
        c_new_a = t1 + t2 - new_a - alg.cmul(1 << 32, carry_a)
        return [sel * c_new_e, sel * c_new_a]


# ---------------------------------------------------------------------------
# Trace generation (host)
# ---------------------------------------------------------------------------


def _compress_with_carries(block: bytes):
    msg_words = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)]
    M32 = (1 << 32) - 1

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M32

    w = list(msg_words)
    cw = [0] * 64
    for t in range(16, 64):
        s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        full = w[t - 16] + s0 + w[t - 7] + s1
        w.append(full & M32)
        cw[t] = full >> 32
    w = w[:64]

    A = {-1: H[0], -2: H[1], -3: H[2], -4: H[3]}
    E = {-1: H[4], -2: H[5], -3: H[6], -4: H[7]}
    ce = [0] * 64
    ca = [0] * 64
    for t in range(64):
        a_in, b, c, d = A[t - 1], A[t - 2], A[t - 3], A[t - 4]
        e_in, f, g, h = E[t - 1], E[t - 2], E[t - 3], E[t - 4]
        S1 = rotr(e_in, 6) ^ rotr(e_in, 11) ^ rotr(e_in, 25)
        ch = (e_in & f) ^ (~e_in & g & M32)
        t1 = h + S1 + ch + K[t] + w[t]
        S0 = rotr(a_in, 2) ^ rotr(a_in, 13) ^ rotr(a_in, 22)
        maj = (a_in & b) ^ (a_in & c) ^ (b & c)
        full_e = d + t1
        E[t] = full_e & M32
        ce[t] = full_e >> 32
        full_a = t1 + S0 + maj
        A[t] = full_a & M32
        ca[t] = full_a >> 32

    digest = []
    cdig_a = [0] * 4
    cdig_e = [0] * 4
    for i in range(4):
        full = H[i] + A[63 - i]
        digest.append(full & M32)
        cdig_a[3 - i] = full >> 32  # stored at row 60 + (3 - i)
    for i in range(4):
        full = H[4 + i] + E[63 - i]
        digest.append(full & M32)
        cdig_e[3 - i] = full >> 32
    return msg_words, w, cw, A, E, ce, ca, digest, cdig_a, cdig_e


def sha256_batch_trace(blocks: list[bytes]):
    """blocks: list of 64-byte padded blocks (independent single-block
    messages). Returns (trace_cols GF (106, 64*B), publics (24*B ints))."""
    B = len(blocks)
    rows = np.zeros((SEGMENT * B, N_COLS), dtype=object)
    publics = []
    for s, block in enumerate(blocks):
        assert len(block) == 64
        msg_words, w, cw, A, E, ce, ca, digest, cdig_a, cdig_e = (
            _compress_with_carries(block)
        )
        base = SEGMENT * s
        for t in range(64):
            for i in range(32):
                rows[base + t][COL_W + i] = (w[t] >> i) & 1
                rows[base + t][COL_A + i] = (A[t] >> i) & 1
                rows[base + t][COL_E + i] = (E[t] >> i) & 1
            rows[base + t][COL_CW] = cw[t] & 1
            rows[base + t][COL_CW + 1] = (cw[t] >> 1) & 1
            for j in range(3):
                rows[base + t][COL_CE + j] = (ce[t] >> j) & 1
                rows[base + t][COL_CA + j] = (ca[t] >> j) & 1
        for r in range(4):
            rows[base + 60 + r][COL_CDIG_A] = cdig_a[r]
            rows[base + 60 + r][COL_CDIG_E] = cdig_e[r]
        publics.extend(msg_words + digest)
    return GF.from_ints(rows.T), publics


def sha256_block_trace(block: bytes):
    """Single-block convenience wrapper."""
    return sha256_batch_trace([block])


def digest_words_to_bytes(words: list[int]) -> bytes:
    return b"".join(int(wd).to_bytes(4, "big") for wd in words)


def pad_single_block(message: bytes) -> bytes:
    """SHA-256 padding for messages <= 55 bytes (single block)."""
    assert len(message) <= 55
    p = message + b"\x80"
    p += bytes(56 - len(p))
    p += (len(message) * 8).to_bytes(8, "big")
    return p
