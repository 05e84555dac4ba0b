"""Subspace-trail resistance check for the Poseidon linear layer.

Being MDS rules out differential/linear attacks but NOT invariant-subspace
trails through the partial rounds (Grassi et al., "Proving Resistance
Against Infinitely Long Subspace Trails"; the published Poseidon parameter
scripts run this check). The sufficient condition implemented here is the
strongest one from that line of work: the characteristic polynomial of the
matrix is irreducible over GF(p). Then the matrix has NO proper nontrivial
invariant subspace at all (an invariant subspace would give the minimal
polynomial a proper factor; irreducible char poly forces min poly == char
poly, irreducible), so no infinitely long subspace trail — with or without
active S-boxes crossing it — can exist for the linear layer.

Polynomials are coefficient lists low -> high over GF(p), p = Goldilocks.
Everything is exact Python-int arithmetic; with n = 12 and the sparse
exponent structure (x^p via square-and-multiply, x^(p^k) via repeated
p-th powers) the whole check runs in well under a second.
"""

from __future__ import annotations

from .goldilocks import P


def charpoly(M: list[list[int]]) -> list[int]:
    """Characteristic polynomial det(xI - M) over GF(p) via the
    Faddeev–LeVerrier recurrence. Returns monic coefficients low -> high,
    length n+1."""
    n = len(M)
    trace = lambda A: sum(A[i][i] for i in range(n)) % P

    def matmul(A, B):
        return [
            [sum(A[i][k] * B[k][j] for k in range(n)) % P for j in range(n)]
            for i in range(n)
        ]

    Mk = [row[:] for row in M]
    cs = []
    for k in range(1, n + 1):
        ck = trace(Mk) * pow(k, P - 2, P) % P
        cs.append(ck)
        if k < n:
            Mc = [
                [(Mk[i][j] - (ck if i == j else 0)) % P for j in range(n)]
                for i in range(n)
            ]
            Mk = matmul(M, Mc)
    # det(xI - M) = x^n - c1 x^(n-1) - c2 x^(n-2) - ... - cn
    coeffs = [0] * (n + 1)
    coeffs[n] = 1
    for k, ck in enumerate(cs, start=1):
        coeffs[n - k] = (-ck) % P
    return coeffs


def poly_eval_matrix(f: list[int], M: list[list[int]]) -> list[list[int]]:
    """f(M) over GF(p) (Horner), for the Cayley–Hamilton sanity check."""
    n = len(M)

    def matmul(A, B):
        return [
            [sum(A[i][k] * B[k][j] for k in range(n)) % P for j in range(n)]
            for i in range(n)
        ]

    acc = [[0] * n for _ in range(n)]
    for c in reversed(f):
        acc = matmul(acc, M)
        for i in range(n):
            acc[i][i] = (acc[i][i] + c) % P
    return acc


def _trim(a: list[int]) -> list[int]:
    while len(a) > 1 and a[-1] == 0:
        a.pop()
    return a


def _mod(a: list[int], f: list[int]) -> list[int]:
    """a mod f, f monic. Coefficients low -> high."""
    a = list(a)
    df = len(f) - 1
    for i in range(len(a) - 1, df - 1, -1):
        c = a[i]
        if c:
            for j in range(df + 1):
                a[i - df + j] = (a[i - df + j] - c * f[j]) % P
    return _trim(a[:df] if df else [0])


def _mulmod(a: list[int], b: list[int], f: list[int]) -> list[int]:
    res = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                res[i + j] = (res[i + j] + x * y) % P
    return _mod(res, f)


def _powmod(a: list[int], e: int, f: list[int]) -> list[int]:
    result = [1]
    base = _mod(a, f)
    while e:
        if e & 1:
            result = _mulmod(result, base, f)
        base = _mulmod(base, base, f)
        e >>= 1
    return result


def _gcd(a: list[int], b: list[int]) -> list[int]:
    a, b = _trim(list(a)), _trim(list(b))
    while b != [0]:
        inv = pow(b[-1], P - 2, P)
        bm = [c * inv % P for c in b]
        a, b = b, _mod(a, bm)
    return a


def _sub(a: list[int], b: list[int]) -> list[int]:
    n = max(len(a), len(b))
    a = a + [0] * (n - len(a))
    b = b + [0] * (n - len(b))
    return _trim([(x - y) % P for x, y in zip(a, b)])


def is_irreducible(f: list[int]) -> bool:
    """Rabin's irreducibility test for monic f over GF(p):
    x^(p^n) ≡ x (mod f), and gcd(x^(p^(n/q)) - x, f) = 1 for every prime
    q | n."""
    f = _trim(list(f))
    n = len(f) - 1
    if n < 1 or f[-1] != 1:
        return False
    x = [0, 1]
    frob = {0: _mod(x, f)}  # x^(p^k) mod f
    xp = _powmod(x, P, f)
    frob[1] = xp

    def frob_k(k: int) -> list[int]:
        if k not in frob:
            frob[k] = _powmod(frob_k(k - 1), P, f)
        return frob[k]

    primes = set()
    m = n
    for q in (2, 3, 5, 7, 11):
        while m % q == 0:
            primes.add(q)
            m //= q
    if m > 1:
        primes.add(m)

    for q in sorted(primes):
        g = _gcd(f, _sub(frob_k(n // q), x))
        if _trim(g) != [1] and len(_trim(g)) != 1:
            return False
    return _sub(frob_k(n), x) == [0]


def linear_layer_secure(M: list[list[int]]) -> bool:
    """True iff char(M) is irreducible over GF(p) — no invariant subspaces,
    hence no infinitely long subspace trails for the linear layer."""
    return is_irreducible(charpoly(M))
