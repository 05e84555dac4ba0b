"""Ed25519 verification AIR — trace layout + generator (constraints: next).

The last major gadget from the reference's capability contract (SURVEY.md
N6, `curta_eddsa_verify_sigs_conditional` at verify.rs:248-259). The witness
kernel in ops/ed25519.py verifies [s]B == R + [k]A with a 253-step Straus
double-and-add ladder over 13-bit-limb curve25519 arithmetic; this module
defines the corresponding AIR trace and generates it host-side, bit-for-bit
matching the device ladder.

Trace layout (per signature, one 256-row segment; rows 0..252 are ladder
steps, rows 253..255 pad by copying):

  row r columns (limbs are 13-bit, LIMB = 20 per field element):
    X[20] Y[20] Z[20] T[20]   extended coordinates of Q BEFORE step r
    sel0, sel1                table-selection bits (s-bit, k-bit) for step r

Planned constraints (round 2):
  * booleanity of sel bits; limb range checks (13-bit) via range table
  * step transition: (X,Y,Z,T)_{r+1} = madd(dbl((X,Y,Z,T)_r), table[sel])
    with the doubling/mixed-addition formulas expressed through committed
    product-witness columns (each 20x20-limb mul adds its 39 raw product
    limbs + carries as auxiliary columns)
  * table binding: the 4 affine table points enter as public columns
    derived from (A, R, B); final-row comparison X*rx_z == ..., via the
    same projective equality used by the witness kernel.

The generator below is the oracle those constraints will be tested against.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ops.ed25519 import (
    BASE_POINT,
    D2_ED,
    L_ORDER,
    N_BITS,
    N_LIMBS,
    P25519,
    decompress,
    int_to_limbs,
    pt_add,
    pt_neg,
)

N_COORD_COLS = 4 * N_LIMBS  # X Y Z T
N_COLS = N_COORD_COLS + 2  # + sel bits
SEGMENT = 256


def _dbl_ext(X, Y, Z, _T):
    """Extended-coordinates doubling, mirroring ops/ed25519._pt_double."""
    A = X * X % P25519
    B = Y * Y % P25519
    C = 2 * Z * Z % P25519
    G = (B - A) % P25519
    F = (G - C) % P25519
    H = (-(A + B)) % P25519
    E = ((X + Y) * (X + Y) - A - B) % P25519
    return (E * F % P25519, G * H % P25519, F * G % P25519, E * H % P25519)


def _madd_ext(X1, Y1, Z1, T1, x2, y2):
    """Unified mixed addition, mirroring ops/ed25519._pt_madd."""
    t2 = x2 * y2 % P25519
    A = (Y1 - X1) * ((y2 - x2) % P25519) % P25519
    B = (Y1 + X1) * ((y2 + x2) % P25519) % P25519
    C = T1 * D2_ED % P25519 * t2 % P25519
    D = 2 * Z1 % P25519
    E = (B - A) % P25519
    F = (D - C) % P25519
    G = (D + C) % P25519
    H = (B + A) % P25519
    return (E * F % P25519, G * H % P25519, F * G % P25519, E * H % P25519)


def ladder_rows(pubkey: bytes, msg: bytes, sig: bytes):
    """All 253 ladder states + selection bits for one signature.

    Returns (states, sels, table, R) where states[r] is (X,Y,Z,T) BEFORE
    step r (states[253] is the final Q), sels[r] = (s_bit, k_bit), table is
    the 4 affine points [identity, B, -A, B-A]."""
    A = decompress(pubkey)
    R = decompress(sig[:32])
    if A is None or R is None:
        raise ValueError("invalid point encoding")
    s = int.from_bytes(sig[32:], "little")
    if s >= L_ORDER:
        raise ValueError("scalar out of range")
    k = (
        int.from_bytes(hashlib.sha512(sig[:32] + pubkey + msg).digest(), "little")
        % L_ORDER
    )
    negA = pt_neg(A)
    table = [(0, 1), BASE_POINT, negA, pt_add(BASE_POINT, negA)]

    Q = (0, 1, 1, 0)  # identity in extended coordinates
    states = [Q]
    sels = []
    for b in range(N_BITS):
        pos = N_BITS - 1 - b
        s_bit = (s >> pos) & 1
        k_bit = (k >> pos) & 1
        Q = _dbl_ext(*Q)
        x2, y2 = table[2 * k_bit + s_bit]
        Q = _madd_ext(*Q, x2, y2)
        states.append(Q)
        sels.append((s_bit, k_bit))
    return states, sels, table, R


def ladder_final_matches(pubkey: bytes, msg: bytes, sig: bytes) -> bool:
    """Projective comparison of the final ladder state against R (the check
    the final-row constraints will enforce)."""
    states, _, _, R = ladder_rows(pubkey, msg, sig)
    X, Y, Z, _ = states[-1]
    return (X - R[0] * Z) % P25519 == 0 and (Y - R[1] * Z) % P25519 == 0


def ed25519_trace(pubkey: bytes, msg: bytes, sig: bytes):
    """(trace (N_COLS, 256) uint32 limb rows, table, R) for one signature."""
    states, sels, table, R = ladder_rows(pubkey, msg, sig)
    rows = np.zeros((SEGMENT, N_COLS), dtype=np.uint32)
    for r in range(SEGMENT):
        state = states[min(r, N_BITS)]
        for ci, coord in enumerate(state):
            rows[r, ci * N_LIMBS : (ci + 1) * N_LIMBS] = int_to_limbs(coord)
        if r < N_BITS:
            rows[r, N_COORD_COLS] = sels[r][0]
            rows[r, N_COORD_COLS + 1] = sels[r][1]
    return rows.T, table, R
