"""SHA-256 compression AIR: prove one 512-bit block bit-exactly.

Constraint-side counterpart of the witness kernel in ops/sha256.py and the
TPU-native equivalent of the reference's SHA-256 STARK gadget
(`curta_sha256_variable`, SURVEY.md N5 — starkyx's sha256 table consumed at
/root/reference/circuits/builder/shared.rs:194).

Layout (64 rows = 64 rounds):
  row t: bits of schedule word w(t), bits of state words a(t) and e(t)
  (the values produced BY round t; b..d and f..h are a/e of earlier rows,
  initial rows use the IV constants), plus carry bits for the modular
  additions. 112 columns, all binary except none. Frame offsets
  {0,1,2,3,4,9,14,16} give constraints their multi-row windows (round
  recurrence and the 16-deep message-schedule recurrence).

Public inputs: 16 message words ‖ 8 digest words (big-endian u32 ints).
Constraint degree 4 (selector x ch/maj/xor3).
"""

from __future__ import annotations

import numpy as np

from ..ops.goldilocks import GF, P
from ..ops.sha256 import _H0, _K
from .air import Air, Frame

N_ROWS = 64
N_BIT_COLS = 96  # w, a, e
# column offsets
COL_W = 0
COL_A = 32
COL_E = 64
COL_CW = 96  # 2 schedule-carry bits
COL_CE = 98  # 3 new_e carry bits
COL_CA = 101  # 3 new_a carry bits
COL_CDIG = 104  # 8 digest carry bits
N_COLS = 112

H = [int(x) for x in _H0]
K = [int(x) for x in _K]


def _bits(v: int) -> list[int]:
    return [(v >> i) & 1 for i in range(32)]


class Sha256Air(Air):
    n_cols = N_COLS
    n_public = 24
    constraint_degree = 4
    frame_offsets = [0, 1, 2, 3, 4, 9, 14, 16]

    # -- periodic selectors ---------------------------------------------------

    def periodic_columns(self):
        sel_main = [1 if s < 60 else 0 for s in range(64)]  # round t = s+4
        sel_sched = [1 if s < 48 else 0 for s in range(64)]  # defines w(s+16)
        sel_init = [1 if s == 0 else 0 for s in range(64)]
        sel_dig = [1 if s == 60 else 0 for s in range(64)]
        k_shift = [K[(s + 4) % 64] for s in range(64)]
        msg_sels = [[1 if s == i else 0 for s in range(64)] for i in range(16)]
        return [sel_main, sel_sched, sel_init, sel_dig, k_shift] + msg_sels

    # -- helpers over the algebra --------------------------------------------

    @staticmethod
    def _val(bits, alg):
        acc = None
        for i, b in enumerate(bits):
            term = alg.const(1 << i) * b
            acc = term if acc is None else acc + term
        return acc

    @staticmethod
    def _xor2(x, y, alg):
        # x + y - 2xy
        return x + y - alg.const(2) * (x * y)

    @classmethod
    def _xor3(cls, x, y, z, alg):
        # x ⊕ y ⊕ z = x+y+z - 2(xy+yz+zx) + 4xyz   (degree 3)
        two = alg.const(2)
        four = alg.const(4)
        return x + y + z - two * (x * y + y * z + z * x) + four * (x * y * z)

    @staticmethod
    def _ch(e, f, g, alg):
        # e f + (1-e) g = g + e(f - g)
        return g + e * (f - g)

    @staticmethod
    def _maj(a, b, c, alg):
        return a * b + a * c + b * c - alg.const(2) * (a * b * c)

    @classmethod
    def _rotr_bits(cls, bits, r):
        # value bits (2^i weights): ROTR^r: out[i] = in[(i + r) % 32]
        return [bits[(i + r) % 32] for i in range(32)]

    @classmethod
    def _shr_bits(cls, bits, r, alg):
        return [bits[i + r] if i + r < 32 else alg.const(0) for i in range(32)]

    @classmethod
    def _sigma0_small(cls, bits, alg):  # σ0 = ROTR7 ^ ROTR18 ^ SHR3
        r7 = cls._rotr_bits(bits, 7)
        r18 = cls._rotr_bits(bits, 18)
        s3 = cls._shr_bits(bits, 3, alg)
        return [cls._xor3(r7[i], r18[i], s3[i], alg) for i in range(32)]

    @classmethod
    def _sigma1_small(cls, bits, alg):  # σ1 = ROTR17 ^ ROTR19 ^ SHR10
        r17 = cls._rotr_bits(bits, 17)
        r19 = cls._rotr_bits(bits, 19)
        s10 = cls._shr_bits(bits, 10, alg)
        return [cls._xor3(r17[i], r19[i], s10[i], alg) for i in range(32)]

    @classmethod
    def _Sigma0(cls, bits, alg):  # Σ0 = ROTR2 ^ ROTR13 ^ ROTR22
        r2 = cls._rotr_bits(bits, 2)
        r13 = cls._rotr_bits(bits, 13)
        r22 = cls._rotr_bits(bits, 22)
        return [cls._xor3(r2[i], r13[i], r22[i], alg) for i in range(32)]

    @classmethod
    def _Sigma1(cls, bits, alg):  # Σ1 = ROTR6 ^ ROTR11 ^ ROTR25
        r6 = cls._rotr_bits(bits, 6)
        r11 = cls._rotr_bits(bits, 11)
        r25 = cls._rotr_bits(bits, 25)
        return [cls._xor3(r6[i], r11[i], r25[i], alg) for i in range(32)]

    # -- frame access ---------------------------------------------------------

    def _cols(self, frame: Frame, offset: int, start: int, count: int):
        row = frame.at_offset(offset, self)
        return row[start : start + count]

    def _a_bits(self, frame, m, alg):
        """a-state bits at round index m relative to an anchor; m < 0 means
        the IV constants H0..H3 (m=-1 -> H0 ... m=-4 -> H3)."""
        if m < 0:
            return [alg.const(b) for b in _bits(H[-1 - m])]
        return self._cols(frame, m, COL_A, 32)

    def _e_bits(self, frame, m, alg):
        if m < 0:
            return [alg.const(b) for b in _bits(H[4 + (-1 - m)])]
        return self._cols(frame, m, COL_E, 32)

    # -- constraint groups ----------------------------------------------------

    def eval_cyclic(self, frame: Frame, alg):
        periodic = frame.periodic
        sel_main, sel_sched, sel_init, sel_dig, k_shift = periodic[:5]
        msg_sels = periodic[5:21]
        out = []

        # 1. booleanity of every bit column (ungated)
        row0 = frame.rows[0]
        one = alg.const(1)
        for c in range(N_COLS):
            b = row0[c]
            out.append(b * (b - one))

        # 2. message binding: w(i) == pub[i] for i < 16
        w_val0 = self._val(self._cols(frame, 0, COL_W, 32), alg)
        for i in range(16):
            out.append(msg_sels[i] * (w_val0 - frame.public[i]))

        # 3. schedule recurrence: w(s+16) = σ1(w(s+14)) + w(s+9) + σ0(w(s+1))
        #    + w(s)  (mod 2^32, carries at row s+16)
        w0 = self._cols(frame, 0, COL_W, 32)
        w1 = self._cols(frame, 1, COL_W, 32)
        w9 = self._cols(frame, 9, COL_W, 32)
        w14 = self._cols(frame, 14, COL_W, 32)
        w16 = self._cols(frame, 16, COL_W, 32)
        cw = self._cols(frame, 16, COL_CW, 2)
        lhs = (
            self._val(self._sigma1_small(w14, alg), alg)
            + self._val(w9, alg)
            + self._val(self._sigma0_small(w1, alg), alg)
            + self._val(w0, alg)
        )
        carry = cw[0] + alg.const(2) * cw[1]
        out.append(
            sel_sched * (lhs - self._val(w16, alg) - alg.const(1 << 32) * carry)
        )

        # 4. generic round t = s+4 (anchor s, gated by sel_main)
        out.extend(
            self._round_constraints(
                frame, alg, sel_main, t_rel=4, k_val=k_shift,
                a_of=lambda m: self._a_bits(frame, m, alg),
                e_of=lambda m: self._e_bits(frame, m, alg),
            )
        )

        # 5. initial rounds t = 0..3 (anchor row 0, gated by sel_init):
        #    inputs at negative round indices resolve to the IV constants
        for t in range(4):
            out.extend(
                self._round_constraints(
                    frame, alg, sel_init, t_rel=t, k_val=alg.const(K[t]),
                    a_of=lambda m: self._a_bits(frame, m, alg),
                    e_of=lambda m: self._e_bits(frame, m, alg),
                )
            )

        # 6. digest binding (anchor row 60): pub[16+i] = H_i + state word
        cdig = self._cols(frame, 0, COL_CDIG, 8)
        two32 = alg.const(1 << 32)
        for i in range(4):  # a, b, c, d from a(63-i) at offset 3-i
            word = self._val(self._cols(frame, 3 - i, COL_A, 32), alg)
            out.append(
                sel_dig
                * (alg.const(H[i]) + word - frame.public[16 + i] - two32 * cdig[i])
            )
        for i in range(4):  # e, f, g, h from e(63-i) at offset 3-i
            word = self._val(self._cols(frame, 3 - i, COL_E, 32), alg)
            out.append(
                sel_dig
                * (
                    alg.const(H[4 + i])
                    + word
                    - frame.public[20 + i]
                    - two32 * cdig[4 + i]
                )
            )
        return out

    def _round_constraints(self, frame, alg, sel, t_rel, k_val, a_of, e_of):
        """Two constraints (new a, new e) for the round whose outputs live at
        offset t_rel. a_of/e_of map 'rounds before the output round' to bit
        lists: a_of(t_rel-1) is a_in, ..., a_of(t_rel-4) is d."""
        a_in = a_of(t_rel - 1)
        b = a_of(t_rel - 2)
        c = a_of(t_rel - 3)
        d_bits = a_of(t_rel - 4)
        e_in = e_of(t_rel - 1)
        f = e_of(t_rel - 2)
        g = e_of(t_rel - 3)
        h_bits = e_of(t_rel - 4)

        w_bits = self._cols(frame, t_rel, COL_W, 32)
        new_a = self._val(self._cols(frame, t_rel, COL_A, 32), alg)
        new_e = self._val(self._cols(frame, t_rel, COL_E, 32), alg)
        ce = self._cols(frame, t_rel, COL_CE, 3)
        ca = self._cols(frame, t_rel, COL_CA, 3)

        t1 = (
            self._val(h_bits, alg)
            + self._val(self._Sigma1(e_in, alg), alg)
            + self._val([self._ch(e_in[i], f[i], g[i], alg) for i in range(32)], alg)
            + k_val
            + self._val(w_bits, alg)
        )
        t2 = self._val(self._Sigma0(a_in, alg), alg) + self._val(
            [self._maj(a_in[i], b[i], c[i], alg) for i in range(32)], alg
        )
        two32 = alg.const(1 << 32)
        carry_e = ce[0] + alg.const(2) * ce[1] + alg.const(4) * ce[2]
        carry_a = ca[0] + alg.const(2) * ca[1] + alg.const(4) * ca[2]
        c_new_e = self._val(d_bits, alg) + t1 - new_e - two32 * carry_e
        c_new_a = t1 + t2 - new_a - two32 * carry_a
        return [sel * c_new_e, sel * c_new_a]


# ---------------------------------------------------------------------------
# Trace generation (host) — one 64-byte block, already padded
# ---------------------------------------------------------------------------


def sha256_block_trace(block: bytes):
    """block: exactly 64 bytes (a single padded SHA-256 block).
    Returns (trace_cols GF (112, 64), publics list[24])."""
    assert len(block) == 64
    msg_words = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)]

    M32 = (1 << 32) - 1

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M32

    # schedule with carries
    w = list(msg_words)
    cw = [0] * 64
    for t in range(16, 64):
        s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        full = w[t - 16] + s0 + w[t - 7] + s1
        w.append(full & M32)
        cw[t] = full >> 32
    w = w[:64]

    # rounds with carries
    a_hist = [H[3], H[2], H[1], H[0]]  # A(-4..-1) reversed storage below
    # A(m): m=-1 -> H0, -2 -> H1, -3 -> H2, -4 -> H3
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
        t2 = S0 + maj
        full_e = d + t1
        E[t] = full_e & M32
        ce[t] = full_e >> 32
        full_a = t1 + t2
        A[t] = full_a & M32
        ca[t] = full_a >> 32

    digest = []
    cdig = [0] * 8
    for i in range(4):
        full = H[i] + A[63 - i]
        digest.append(full & M32)
        cdig[i] = full >> 32
    for i in range(4):
        full = H[4 + i] + E[63 - i]
        digest.append(full & M32)
        cdig[4 + i] = full >> 32

    rows = np.zeros((64, N_COLS), dtype=object)
    for t in range(64):
        for i in range(32):
            rows[t][COL_W + i] = (w[t] >> i) & 1
            rows[t][COL_A + i] = (A[t] >> i) & 1
            rows[t][COL_E + i] = (E[t] >> i) & 1
        rows[t][COL_CW] = cw[t] & 1
        rows[t][COL_CW + 1] = (cw[t] >> 1) & 1
        for j in range(3):
            rows[t][COL_CE + j] = (ce[t] >> j) & 1
            rows[t][COL_CA + j] = (ca[t] >> j) & 1
    for i in range(8):
        rows[60][COL_CDIG + i] = cdig[i]

    publics = msg_words + digest
    return GF.from_ints(rows.T), publics


def digest_words_to_bytes(words: list[int]) -> bytes:
    return b"".join(int(wd).to_bytes(4, "big") for wd in words)


def pad_single_block(message: bytes) -> bytes:
    """SHA-256 padding for messages <= 55 bytes (single block)."""
    assert len(message) <= 55
    p = message + b"\x80"
    p += bytes(56 - len(p))
    p += (len(message) * 8).to_bytes(8, "big")
    return p
