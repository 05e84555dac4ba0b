// Native host-side verifier core: Goldilocks arithmetic + Poseidon.
//
// The STARK verifier and Fiat-Shamir challenger run on the host (they are
// sequential and tiny next to proving), but their cost is dominated by
// Poseidon permutations over Goldilocks. This C++ core implements that hot
// path natively; Python loads it via ctypes with a pure-Python fallback
// (tendermintx_tpu/utils/native.py). Parameters (round constants, MDS) are
// injected at init time from the Python side so there is a single source of
// truth for the hash definition (ops/poseidon.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtmx_native.so \
//            goldilocks_poseidon.cpp

#include <cstdint>
#include <cstring>

extern "C" {

static const uint64_t P = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    // carry or s >= P  =>  subtract P (equivalently add 2^32 - 1 on wrap)
    if (s < a) s += 0xFFFFFFFFULL;  // s = a + b - 2^64 + (2^32 - 1) ≡ a+b (mod P)
    if (s >= P) s -= P;
    return s;
}

static inline uint64_t gl_sub(uint64_t a, uint64_t b) {
    uint64_t d = a - b;
    if (a < b) d -= 0xFFFFFFFFULL;  // borrow: wraps consistently mod P
    return d >= P ? d - P : d;
}

static inline uint64_t gl_reduce128(__uint128_t x) {
    uint64_t lo = (uint64_t)x;
    uint64_t hi = (uint64_t)(x >> 64);
    uint64_t hi_hi = hi >> 32;
    uint64_t hi_lo = hi & 0xFFFFFFFFULL;
    uint64_t t = lo - hi_hi;
    if (lo < hi_hi) t -= 0xFFFFFFFFULL;
    uint64_t m = (hi_lo << 32) - hi_lo;  // hi_lo * (2^32 - 1)
    uint64_t s = t + m;
    if (s < t) s += 0xFFFFFFFFULL;
    if (s >= P) s -= P;
    return s;
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
    return gl_reduce128((__uint128_t)a * b);
}

uint64_t tmx_gl_mul(uint64_t a, uint64_t b) { return gl_mul(a, b); }
uint64_t tmx_gl_add(uint64_t a, uint64_t b) { return gl_add(a, b); }
uint64_t tmx_gl_sub(uint64_t a, uint64_t b) { return gl_sub(a, b); }

uint64_t tmx_gl_pow(uint64_t a, uint64_t e) {
    uint64_t r = 1;
    while (e) {
        if (e & 1) r = gl_mul(r, a);
        a = gl_mul(a, a);
        e >>= 1;
    }
    return r;
}

uint64_t tmx_gl_inv(uint64_t a) { return a ? tmx_gl_pow(a, P - 2) : 0; }

// ---------------------------------------------------------------------------
// Poseidon (width 12, 8 full + 22 partial rounds, x^7) — parameters injected.
// ---------------------------------------------------------------------------

static const int WIDTH = 12;
static const int N_ROUNDS = 30;
static const int HALF_FULL = 4;
static const int PARTIAL = 22;

static uint64_t RC[N_ROUNDS][WIDTH];
static uint64_t MDS[WIDTH][WIDTH];
static int initialized = 0;

void tmx_poseidon_init(const uint64_t* rc, const uint64_t* mds) {
    for (int r = 0; r < N_ROUNDS; r++)
        for (int j = 0; j < WIDTH; j++) RC[r][j] = rc[r * WIDTH + j];
    for (int i = 0; i < WIDTH; i++)
        for (int j = 0; j < WIDTH; j++) MDS[i][j] = mds[i * WIDTH + j];
    initialized = 1;
}

static inline uint64_t sbox7(uint64_t x) {
    uint64_t x2 = gl_mul(x, x);
    uint64_t x3 = gl_mul(x2, x);
    uint64_t x4 = gl_mul(x2, x2);
    return gl_mul(x3, x4);
}

static inline void mds_apply(uint64_t* s) {
    uint64_t out[WIDTH];
    for (int i = 0; i < WIDTH; i++) {
        __uint128_t acc = 0;
        // accumulate 12 full products in 128 bits: 12 * (2^64)^2 overflows,
        // so reduce each product first and add mod-free in 128 bits
        for (int j = 0; j < WIDTH; j++)
            acc += (__uint128_t)gl_mul(MDS[i][j], s[j]);
        out[i] = gl_reduce128(acc);
    }
    memcpy(s, out, sizeof(out));
}

void tmx_poseidon_permute(uint64_t* state) {
    if (!initialized) return;
    uint64_t s[WIDTH];
    memcpy(s, state, sizeof(s));
    int r = 0;
    for (int k = 0; k < HALF_FULL; k++, r++) {
        for (int j = 0; j < WIDTH; j++) s[j] = sbox7(gl_add(s[j], RC[r][j]));
        mds_apply(s);
    }
    for (int k = 0; k < PARTIAL; k++, r++) {
        for (int j = 0; j < WIDTH; j++) s[j] = gl_add(s[j], RC[r][j]);
        s[0] = sbox7(s[0]);
        mds_apply(s);
    }
    for (int k = 0; k < HALF_FULL; k++, r++) {
        for (int j = 0; j < WIDTH; j++) s[j] = sbox7(gl_add(s[j], RC[r][j]));
        mds_apply(s);
    }
    memcpy(state, s, sizeof(s));
}

// Sponge hash (overwrite mode, rate 8) of `len` elements -> 4-element digest.
void tmx_poseidon_hash(const uint64_t* inputs, uint64_t len, uint64_t* digest) {
    uint64_t state[WIDTH];
    memset(state, 0, sizeof(state));
    for (uint64_t i = 0; i < len; i += 8) {
        uint64_t chunk = len - i < 8 ? len - i : 8;
        for (uint64_t j = 0; j < chunk; j++) state[j] = inputs[i + j];
        tmx_poseidon_permute(state);
    }
    memcpy(digest, state, 4 * sizeof(uint64_t));
}

void tmx_poseidon_two_to_one(const uint64_t* left, const uint64_t* right,
                             uint64_t* digest) {
    uint64_t state[WIDTH];
    memset(state, 0, sizeof(state));
    memcpy(state, left, 4 * sizeof(uint64_t));
    memcpy(state + 4, right, 4 * sizeof(uint64_t));
    tmx_poseidon_permute(state);
    memcpy(digest, state, 4 * sizeof(uint64_t));
}

// MDS property check: a matrix is MDS iff every square submatrix is
// nonsingular. Brute-forces all minors of the n x n matrix (n <= 12:
// sum_k C(n,k)^2 ~ 2.7M determinants via Gaussian elimination mod P).
// Returns 1 if MDS, 0 otherwise. Used (offline + slow test) to validate
// the small-entry Poseidon MDS matrix in ops/poseidon.py.
int tmx_mds_check(const uint64_t* m, int n) {
    if (n > 12) return 0;
    int full = 1 << n;
    // row/col index lists per mask, precomputed
    for (int rmask = 1; rmask < full; rmask++) {
        int k = __builtin_popcount(rmask);
        int rows[12];
        int ri = 0;
        for (int i = 0; i < n; i++)
            if (rmask & (1 << i)) rows[ri++] = i;
        for (int cmask = 1; cmask < full; cmask++) {
            if (__builtin_popcount(cmask) != k) continue;
            int cols[12];
            int ci = 0;
            for (int j = 0; j < n; j++)
                if (cmask & (1 << j)) cols[ci++] = j;
            uint64_t a[12][12];
            for (int i = 0; i < k; i++)
                for (int j = 0; j < k; j++) a[i][j] = m[rows[i] * n + cols[j]];
            // Gaussian elimination; determinant zero <=> singular minor
            int singular = 0;
            for (int col = 0; col < k && !singular; col++) {
                int piv = -1;
                for (int r = col; r < k; r++)
                    if (a[r][col]) { piv = r; break; }
                if (piv < 0) { singular = 1; break; }
                if (piv != col)
                    for (int j = col; j < k; j++) {
                        uint64_t t = a[col][j];
                        a[col][j] = a[piv][j];
                        a[piv][j] = t;
                    }
                uint64_t inv = tmx_gl_inv(a[col][col]);
                for (int r = col + 1; r < k; r++) {
                    if (!a[r][col]) continue;
                    uint64_t f = gl_mul(a[r][col], inv);
                    for (int j = col; j < k; j++)
                        a[r][j] = gl_sub(a[r][j], gl_mul(f, a[col][j]));
                }
            }
            if (singular) return 0;
        }
    }
    return 1;
}

// Merkle opening verification: leaf row hash + path walk. Returns 1 on match.
int tmx_merkle_verify(const uint64_t* root, uint64_t index,
                      const uint64_t* leaf_row, uint64_t row_len,
                      const uint64_t* path, uint64_t path_len) {
    uint64_t digest[4];
    tmx_poseidon_hash(leaf_row, row_len, digest);
    for (uint64_t d = 0; d < path_len; d++) {
        const uint64_t* sibling = path + 4 * d;
        uint64_t out[4];
        if (index & 1) tmx_poseidon_two_to_one(sibling, digest, out);
        else tmx_poseidon_two_to_one(digest, sibling, out);
        memcpy(digest, out, sizeof(out));
        index >>= 1;
    }
    for (int i = 0; i < 4; i++)
        if (digest[i] != root[i]) return 0;
    return 1;
}

}  // extern "C"
