// Native host runtime for ministark_tpu.
//
// The reference implements its entire host runtime in Rust; here the TPU
// compute path is JAX/Pallas and this C++ module covers the host-side hot
// paths the Python layer would otherwise bottleneck on: Goldilocks scalar &
// batch arithmetic, SHA-256 (transcript + Merkle verification), Merkle node
// chains, and the proof-of-work nonce grind (reference: src/random.rs:48-57).
//
// Exposed as a plain C ABI consumed via ctypes (ministark_tpu/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// Goldilocks field p = 2^64 - 2^32 + 1
// ---------------------------------------------------------------------------

static const uint64_t GL_P = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_reduce128(unsigned __int128 x) {
    uint64_t lo = (uint64_t)x;
    uint64_t hi = (uint64_t)(x >> 64);
    uint64_t hi_lo = hi & 0xFFFFFFFFULL;
    uint64_t hi_hi = hi >> 32;
    // x = lo + 2^64*hi_lo + 2^96*hi_hi ; 2^64 = 2^32-1, 2^96 = -1 (mod p)
    uint64_t t = lo - hi_hi;
    if (lo < hi_hi) t -= 0xFFFFFFFFULL;  // borrow: -2^64 == -(2^32-1)
    uint64_t u = (hi_lo << 32) - hi_lo;
    uint64_t r = t + u;
    if (r < t) r += 0xFFFFFFFFULL;       // carry: +2^64 == +(2^32-1)
    if (r >= GL_P) r -= GL_P;
    return r;
}

uint64_t gl_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    if (s < a || s >= GL_P) s -= GL_P;
    return s;
}

uint64_t gl_sub(uint64_t a, uint64_t b) {
    return a >= b ? a - b : a + GL_P - b;
}

uint64_t gl_mul(uint64_t a, uint64_t b) {
    return gl_reduce128((unsigned __int128)a * b);
}

uint64_t gl_pow(uint64_t base, uint64_t exp) {
    uint64_t acc = 1;
    while (exp) {
        if (exp & 1) acc = gl_mul(acc, base);
        base = gl_mul(base, base);
        exp >>= 1;
    }
    return acc;
}

uint64_t gl_inv(uint64_t a) { return gl_pow(a, GL_P - 2); }

void gl_batch_mul(const uint64_t* a, const uint64_t* b, uint64_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

void gl_batch_add(const uint64_t* a, const uint64_t* b, uint64_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

// Montgomery-trick batch inversion (all inputs nonzero)
void gl_batch_inv(const uint64_t* a, uint64_t* out, size_t n) {
    if (n == 0) return;
    uint64_t acc = 1;
    for (size_t i = 0; i < n; i++) { out[i] = acc; acc = gl_mul(acc, a[i]); }
    uint64_t inv = gl_inv(acc);
    for (size_t i = n; i-- > 0;) {
        uint64_t tmp = gl_mul(out[i], inv);
        inv = gl_mul(inv, a[i]);
        out[i] = tmp;
    }
}

// Horner evaluation of a polynomial (coeffs low->high) at x
uint64_t gl_horner(const uint64_t* coeffs, size_t n, uint64_t x) {
    uint64_t acc = 0;
    for (size_t i = n; i-- > 0;) acc = gl_add(gl_mul(acc, x), coeffs[i]);
    return acc;
}

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4)
// ---------------------------------------------------------------------------

static const uint32_t K256[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr32(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

static void sha256_compress(uint32_t st[8], const uint8_t block[64]) {
    uint32_t w[64];
    for (int t = 0; t < 16; t++)
        w[t] = ((uint32_t)block[4 * t] << 24) | ((uint32_t)block[4 * t + 1] << 16) |
               ((uint32_t)block[4 * t + 2] << 8) | block[4 * t + 3];
    for (int t = 16; t < 64; t++) {
        uint32_t s0 = rotr32(w[t - 15], 7) ^ rotr32(w[t - 15], 18) ^ (w[t - 15] >> 3);
        uint32_t s1 = rotr32(w[t - 2], 17) ^ rotr32(w[t - 2], 19) ^ (w[t - 2] >> 10);
        w[t] = w[t - 16] + s0 + w[t - 7] + s1;
    }
    uint32_t a = st[0], b = st[1], c = st[2], d = st[3];
    uint32_t e = st[4], f = st[5], g = st[6], h = st[7];
    for (int t = 0; t < 64; t++) {
        uint32_t S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K256[t] + w[t];
        uint32_t S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + maj;
        h = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
    st[4] += e; st[5] += f; st[6] += g; st[7] += h;
}

void sha256(const uint8_t* data, size_t len, uint8_t out[32]) {
    uint32_t st[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                      0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t i = 0;
    for (; i + 64 <= len; i += 64) sha256_compress(st, data + i);
    uint8_t block[128] = {0};
    size_t rem = len - i;
    memcpy(block, data + i, rem);
    block[rem] = 0x80;
    size_t total = rem + 1 <= 56 ? 64 : 128;
    uint64_t bits = (uint64_t)len * 8;
    for (int k = 0; k < 8; k++) block[total - 1 - k] = (uint8_t)(bits >> (8 * k));
    sha256_compress(st, block);
    if (total == 128) sha256_compress(st, block + 64);
    for (int k = 0; k < 8; k++) {
        out[4 * k] = (uint8_t)(st[k] >> 24);
        out[4 * k + 1] = (uint8_t)(st[k] >> 16);
        out[4 * k + 2] = (uint8_t)(st[k] >> 8);
        out[4 * k + 3] = (uint8_t)st[k];
    }
}

// merge = sha256(d0 || d1): Merkle node chain verification
void sha256_merge(const uint8_t d0[32], const uint8_t d1[32], uint8_t out[32]) {
    uint8_t buf[64];
    memcpy(buf, d0, 32);
    memcpy(buf + 32, d1, 32);
    sha256(buf, 64, out);
}

static inline int leading_zero_bits(const uint8_t d[32]) {
    int z = 0;
    for (int i = 0; i < 32; i++) {
        if (d[i] == 0) { z += 8; continue; }
        uint8_t b = d[i];
        while (!(b & 0x80)) { z++; b <<= 1; }
        break;
    }
    return z;
}

// Proof-of-work grind: smallest nonce >= 1 with
// leading_zeros(sha256(seed || nonce_be)) >= bits  (src/random.rs:48-57,129-132)
uint64_t pow_grind(const uint8_t seed[32], uint32_t bits) {
    uint8_t buf[40];
    memcpy(buf, seed, 32);
    for (uint64_t nonce = 1;; nonce++) {
        for (int k = 0; k < 8; k++) buf[32 + k] = (uint8_t)(nonce >> (56 - 8 * k));
        uint8_t d[32];
        sha256(buf, 40, d);
        if ((uint32_t)leading_zero_bits(d) >= bits) return nonce;
    }
}

// hash a batch of rows of field elements: rows (n x width) canonical values;
// out = n digests of 32 bytes (hash_elements semantics: 8-byte LE each)
void gl_hash_rows(const uint64_t* rows, size_t n, size_t width, uint8_t* out) {
    for (size_t i = 0; i < n; i++) {
        // little-endian serialization is the in-memory layout on LE hosts
        sha256((const uint8_t*)(rows + i * width), width * 8, out + 32 * i);
    }
}

// build a full Merkle tree over n leaf digests (n power of two);
// nodes laid out heap-style: nodes[1] = root, leaves occupy [n, 2n)
void merkle_build(const uint8_t* leaves, size_t n, uint8_t* nodes) {
    memcpy(nodes + 32 * n, leaves, 32 * n);
    for (size_t i = n - 1; i >= 1; i--) {
        sha256_merge(nodes + 32 * (2 * i), nodes + 32 * (2 * i + 1), nodes + 32 * i);
    }
}

}  // extern "C"

extern "C" {

// fib example trace generation (examples/fib/main.rs:175-222 semantics):
// 8 columns x num_rows, row-major output buffer
void gen_fib_trace(uint64_t* out, size_t num_rows) {
    uint64_t v[8];
    v[0] = 1; v[1] = 2;
    for (int k = 2; k < 8; k++) v[k] = gl_mul(v[k - 2], v[k - 1]);
    for (size_t r = 0; r < num_rows; r++) {
        memcpy(out + r * 8, v, sizeof(v));
        uint64_t n0 = gl_mul(v[6], v[7]);
        uint64_t n1 = gl_mul(v[7], n0);
        v[0] = n0; v[1] = n1;
        for (int k = 2; k < 8; k++) v[k] = gl_mul(v[k - 2], v[k - 1]);
    }
}

}  // extern "C"
