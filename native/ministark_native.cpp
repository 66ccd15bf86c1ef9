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
#include <vector>

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

// ---------------------------------------------------------------------------
// Fq3 = Fp[u]/(u^3 - 2)  (gpu/src/fields.rs:78-95) — components canonical u64
// ---------------------------------------------------------------------------

static const uint64_t FQ3_M = 2;  // NONRESIDUE

static inline void fq3_add_(const uint64_t* a, const uint64_t* b, uint64_t* o) {
    o[0] = gl_add(a[0], b[0]); o[1] = gl_add(a[1], b[1]); o[2] = gl_add(a[2], b[2]);
}

static inline void fq3_sub_(const uint64_t* a, const uint64_t* b, uint64_t* o) {
    o[0] = gl_sub(a[0], b[0]); o[1] = gl_sub(a[1], b[1]); o[2] = gl_sub(a[2], b[2]);
}

static inline void fq3_mul_(const uint64_t* a, const uint64_t* b, uint64_t* o) {
    uint64_t a0 = a[0], a1 = a[1], a2 = a[2];
    uint64_t b0 = b[0], b1 = b[1], b2 = b[2];
    uint64_t t0 = gl_add(gl_mul(a0, b0),
                         gl_mul(FQ3_M, gl_add(gl_mul(a1, b2), gl_mul(a2, b1))));
    uint64_t t1 = gl_add(gl_add(gl_mul(a0, b1), gl_mul(a1, b0)),
                         gl_mul(FQ3_M, gl_mul(a2, b2)));
    uint64_t t2 = gl_add(gl_add(gl_mul(a0, b2), gl_mul(a1, b1)), gl_mul(a2, b0));
    o[0] = t0; o[1] = t1; o[2] = t2;
}

static inline void fq3_mul_fp_(const uint64_t* a, uint64_t f, uint64_t* o) {
    o[0] = gl_mul(a[0], f); o[1] = gl_mul(a[1], f); o[2] = gl_mul(a[2], f);
}

// standard cubic-extension inverse for u^3 = m (fields/scalar.py Fq3.inverse)
static inline void fq3_inv_(const uint64_t* x, uint64_t* o) {
    uint64_t a = x[0], b = x[1], c = x[2];
    uint64_t v0 = gl_sub(gl_mul(a, a), gl_mul(FQ3_M, gl_mul(b, c)));
    uint64_t v1 = gl_sub(gl_mul(FQ3_M, gl_mul(c, c)), gl_mul(a, b));
    uint64_t v2 = gl_sub(gl_mul(b, b), gl_mul(a, c));
    uint64_t norm = gl_add(gl_mul(a, v0),
                           gl_mul(FQ3_M, gl_add(gl_mul(c, v1), gl_mul(b, v2))));
    uint64_t ninv = gl_inv(norm);
    o[0] = gl_mul(v0, ninv); o[1] = gl_mul(v1, ninv); o[2] = gl_mul(v2, ninv);
}

static inline uint32_t bitrev_u32(uint32_t i, uint32_t bits) {
    uint32_t r = 0;
    for (uint32_t b = 0; b < bits; b++) r |= ((i >> b) & 1u) << (bits - 1 - b);
    return r;
}

extern "C" {

void fq3_mul(const uint64_t a[3], const uint64_t b[3], uint64_t out[3]) {
    fq3_mul_(a, b, out);
}

void fq3_inv(const uint64_t a[3], uint64_t out[3]) { fq3_inv_(a, out); }

// ---------------------------------------------------------------------------
// Merkle multi-proof verification (queue algorithm, src/merkle.rs:209-288;
// exact mirror of ministark_tpu/merkle.py verify_view).  SHA-256 merges.
// Returns 0 = valid; 1..7 = the python path's failure modes in order.
// `indices` must be sorted unique, each < 2^height.
// ---------------------------------------------------------------------------
int mk_verify_view(const uint8_t root[32], uint32_t height,
                   const uint64_t* indices, size_t n_idx,
                   const uint8_t* initial_leaves,
                   const uint8_t* sibling_leaves, size_t n_sib,
                   const uint8_t* nodes, size_t n_nodes) {
    const uint64_t n = 1ULL << height;
    for (size_t i = 0; i < n_idx; i++)
        if (indices[i] >= n) return 1;  // leaf index out of bounds

    struct Node { uint64_t index; uint8_t h[32]; };
    std::vector<Node> node_queue;
    node_queue.reserve(n_idx * (height + 1));

    size_t si = 0, qi = 0;
    while (qi < n_idx) {
        uint64_t index = indices[qi];
        const uint8_t* leaf = initial_leaves + 32 * qi;
        qi++;
        Node nd;
        nd.index = (n + index) >> 1;
        if (qi < n_idx && indices[qi] == (index ^ 1)) {
            sha256_merge(leaf, initial_leaves + 32 * qi, nd.h);
            qi++;
        } else {
            if (si >= n_sib) return 2;  // missing sibling leaf
            const uint8_t* sib = sibling_leaves + 32 * si;
            si++;
            if (index % 2 == 0) sha256_merge(leaf, sib, nd.h);
            else sha256_merge(sib, leaf, nd.h);
        }
        node_queue.push_back(nd);
    }
    if (si != n_sib) return 3;  // extra sibling leaves

    size_t ni = 0, qn = 0;
    while (qn < node_queue.size()) {
        Node cur = node_queue[qn];
        qn++;
        if (cur.index == 1) {
            if (qn != node_queue.size()) return 4;  // malformed proof
            return memcmp(root, cur.h, 32) == 0 ? 0 : 5;  // root mismatch
        }
        Node nd;
        nd.index = cur.index >> 1;
        if (qn < node_queue.size() && node_queue[qn].index == (cur.index ^ 1)) {
            sha256_merge(cur.h, node_queue[qn].h, nd.h);
            qn++;
        } else {
            if (ni >= n_nodes) return 6;  // missing node
            const uint8_t* sib = nodes + 32 * ni;
            ni++;
            if (cur.index % 2 == 0) sha256_merge(cur.h, sib, nd.h);
            else sha256_merge(sib, cur.h, nd.h);
        }
        node_queue.push_back(nd);
    }
    return 7;  // proof did not reach root
}

// ---------------------------------------------------------------------------
// FRI next-layer evaluations (src/fri.rs:347-425 verifier side; mirrors
// ministark_tpu/fri.py FriVerifier.verify inner loop):
// per row: chunk[j] = row[bitrev_N(j)], coset iNTT over {offset * w^i},
// then Horner with coefficient scale N at alpha.
// rows: n*N Fq3 triples; offsets: n Fp; w = primitive N-th root.
// ---------------------------------------------------------------------------
void fri_fold_rows(const uint64_t* rows, size_t n, uint32_t N,
                   const uint64_t* offsets, uint64_t w,
                   const uint64_t alpha[3], uint64_t* out) {
    uint32_t logN = 0;
    while ((1u << logN) < N) logN++;
    uint64_t n_inv = gl_inv(N);
    std::vector<uint64_t> wpow(N);  // w^t, t < N
    wpow[0] = 1;
    for (uint32_t t = 1; t < N; t++) wpow[t] = gl_mul(wpow[t - 1], w);

    std::vector<uint64_t> chunk(3 * N), coeffs(3 * N);
    for (size_t r = 0; r < n; r++) {
        const uint64_t* row = rows + r * N * 3;
        for (uint32_t j = 0; j < N; j++) {
            uint32_t src = bitrev_u32(j, logN);
            memcpy(&chunk[3 * j], row + 3 * src, 3 * sizeof(uint64_t));
        }
        uint64_t off_inv = gl_inv(offsets[r]);
        uint64_t off_inv_k = 1;
        for (uint32_t k = 0; k < N; k++) {
            uint64_t acc[3] = {0, 0, 0};
            for (uint32_t i = 0; i < N; i++) {
                uint64_t wexp = wpow[(N - (uint32_t)(((uint64_t)i * k) % N)) % N];
                uint64_t term[3];
                fq3_mul_fp_(&chunk[3 * i], wexp, term);
                fq3_add_(acc, term, acc);
            }
            fq3_mul_fp_(acc, gl_mul(n_inv, off_inv_k), &coeffs[3 * k]);
            off_inv_k = gl_mul(off_inv_k, off_inv);
        }
        uint64_t acc[3] = {0, 0, 0};
        for (uint32_t k = N; k-- > 0;) {
            uint64_t t[3], cN[3];
            fq3_mul_(acc, alpha, t);
            fq3_mul_fp_(&coeffs[3 * k], N, cN);
            fq3_add_(t, cN, acc);
        }
        memcpy(out + 3 * r, acc, 3 * sizeof(uint64_t));
    }
}

// ---------------------------------------------------------------------------
// DEEP composition evaluations at the query points (src/verifier.rs:238-297;
// mirrors ministark_tpu/verifier.py deep_composition_evaluations):
// out_i = [ sum_j a_j*(T_ij - ood_j)/(x_i - zs_j)
//         + sum_k b_k*(C_ik - cood_k)/(x_i - z_n) ] * (da + db*x_i)
// xs: n Fp; trace_vals: n*n_args Fq3; comp_vals: n*n_comp Fq3; rest Fq3.
// ---------------------------------------------------------------------------
void deep_evals(const uint64_t* xs, size_t n,
                size_t n_args, const uint64_t* trace_vals,
                const uint64_t* oods, const uint64_t* alphas,
                const uint64_t* zshifts,
                size_t n_comp, const uint64_t* comp_vals,
                const uint64_t* coods, const uint64_t* betas,
                const uint64_t zn[3],
                const uint64_t da[3], const uint64_t db[3],
                uint64_t* out) {
    for (size_t i = 0; i < n; i++) {
        uint64_t x = xs[i];
        uint64_t xe[3] = {x, 0, 0};
        uint64_t acc[3] = {0, 0, 0};
        for (size_t j = 0; j < n_args; j++) {
            uint64_t num[3], den[3], inv[3], t[3];
            fq3_sub_(trace_vals + (i * n_args + j) * 3, oods + 3 * j, num);
            fq3_sub_(xe, zshifts + 3 * j, den);
            fq3_inv_(den, inv);
            fq3_mul_(num, inv, t);
            fq3_mul_(t, alphas + 3 * j, t);
            fq3_add_(acc, t, acc);
        }
        uint64_t denc[3], invc[3];
        fq3_sub_(xe, zn, denc);
        fq3_inv_(denc, invc);
        for (size_t k = 0; k < n_comp; k++) {
            uint64_t num[3], t[3];
            fq3_sub_(comp_vals + (i * n_comp + k) * 3, coods + 3 * k, num);
            fq3_mul_(num, invc, t);
            fq3_mul_(t, betas + 3 * k, t);
            fq3_add_(acc, t, acc);
        }
        uint64_t adj[3], dbx[3];
        fq3_mul_fp_(db, x, dbx);
        fq3_add_(da, dbx, adj);
        fq3_mul_(acc, adj, out + 3 * i);
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
