// primia_native: host-side runtime kernels for the TPU-native PriMIA
// rebuild. The reference's only native dependency is `shaloop`, a Rust
// SIMD SHA-256/512 keystream used by its FSS layer
// (syft/frameworks/torch/mpc/fss.py:14,532,581). This library plays the
// same role for the host paths of this framework, in C++:
//
//   * sha256_keystream   — crypto-grade PRG (SHA-256 in counter mode)
//   * encode_and_share   — fixed-point encode + 2-party additive share
//                          split of a float tensor in one OpenMP pass
//                          (the serve node's `get_data_shares` hot path:
//                          what leaves a data-owner node is this stream)
//   * percentile_stretch — DICOM contrast windowing (u16 -> u8), the
//                          pixel transform of torchlib/dicomtools.py
//   * resize_bilinear_u8 — batched HWC uint8 bilinear resize
//
// Everything is extern "C" and called from Python via ctypes
// (primia_tpu/native.py); every entry point has a pure-Python fallback.
//
// Build: g++ -O3 -shared -fPIC -fopenmp (see native/Makefile).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

// ============================================================ SHA-256

namespace {

struct Sha256 {
    static constexpr uint32_t K[64] = {
        0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b,
        0x59f111f1, 0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01,
        0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7,
        0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
        0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152,
        0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
        0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
        0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
        0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819,
        0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116, 0x1e376c08,
        0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f,
        0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
        0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

    static inline uint32_t rotr(uint32_t x, int n) {
        return (x >> n) | (x << (32 - n));
    }

    // One compression of a single 64-byte block into state h[8].
    static void compress(uint32_t h[8], const uint8_t block[64]) {
        uint32_t w[64];
        for (int i = 0; i < 16; ++i)
            w[i] = (uint32_t(block[4 * i]) << 24) |
                   (uint32_t(block[4 * i + 1]) << 16) |
                   (uint32_t(block[4 * i + 2]) << 8) |
                   uint32_t(block[4 * i + 3]);
        for (int i = 16; i < 64; ++i) {
            uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
            uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
            w[i] = w[i - 16] + s0 + w[i - 7] + s1;
        }
        uint32_t a = h[0], b = h[1], c = h[2], d = h[3];
        uint32_t e = h[4], f = h[5], g = h[6], hh = h[7];
        for (int i = 0; i < 64; ++i) {
            uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
            uint32_t ch = (e & f) ^ (~e & g);
            uint32_t t1 = hh + S1 + ch + K[i] + w[i];
            uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
            uint32_t mj = (a & b) ^ (a & c) ^ (b & c);
            uint32_t t2 = S0 + mj;
            hh = g; g = f; f = e; e = d + t1;
            d = c; c = b; b = a; a = t1 + t2;
        }
        h[0] += a; h[1] += b; h[2] += c; h[3] += d;
        h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
    }
};

constexpr uint32_t Sha256::K[64];

const uint32_t SHA256_INIT[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                 0xa54ff53a, 0x510e527f, 0x9b05688c,
                                 0x1f83d9ab, 0x5be0cd19};

// One CTR block: digest of the 64-byte message [seed(32) | ctr(8) | pad]
// with standard SHA-256 padding precomputed for a 40-byte message.
inline void ctr_block(const uint8_t seed[32], uint64_t ctr, uint8_t out[32]) {
    uint8_t block[64];
    std::memcpy(block, seed, 32);
    for (int i = 0; i < 8; ++i) block[32 + i] = uint8_t(ctr >> (56 - 8 * i));
    block[40] = 0x80;
    std::memset(block + 41, 0, 64 - 41);
    // message length in bits (40 bytes = 320 bits) in the last 8 bytes
    block[62] = 0x01; block[63] = 0x40;
    uint32_t h[8];
    std::memcpy(h, SHA256_INIT, sizeof h);
    Sha256::compress(h, block);
    for (int i = 0; i < 8; ++i) {
        out[4 * i] = uint8_t(h[i] >> 24);
        out[4 * i + 1] = uint8_t(h[i] >> 16);
        out[4 * i + 2] = uint8_t(h[i] >> 8);
        out[4 * i + 3] = uint8_t(h[i]);
    }
}

}  // namespace

extern "C" {

// Fill `out[0..nbytes)` with SHA-256-CTR keystream under a 32-byte seed.
// Parallel over counter blocks (each block independent).
void sha256_keystream(const uint8_t* seed, uint64_t nbytes, uint8_t* out) {
    const int64_t nblocks = int64_t((nbytes + 31) / 32);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < nblocks; ++i) {
        uint8_t buf[32];
        ctr_block(seed, uint64_t(i), buf);
        const uint64_t off = uint64_t(i) * 32;
        const uint64_t n = std::min<uint64_t>(32, nbytes - off);
        std::memcpy(out + off, buf, n);
    }
}

// Fixed-point encode x into the Z_2^64 ring (scale 2^frac_bits, round
// half away from zero like torch .round()) and split into two additive
// shares with a SHA-256-CTR share stream: share0 = r, share1 = v - r.
// (Fixed-point rounding is half-to-even, matching numpy/torch .round().)
// One OpenMP pass; this is the stream a data-owner node emits for
// encrypted inference (serve/node.py get_data_shares).
void encode_and_share_f32(const float* x, int64_t n, int frac_bits,
                          const uint8_t* seed, int64_t* share0,
                          int64_t* share1) {
    const double scale = std::ldexp(1.0, frac_bits);
    const int64_t nblocks = (n + 3) / 4;  // 4 ring elements per SHA block
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t blk = 0; blk < nblocks; ++blk) {
        uint8_t buf[32];
        ctr_block(seed, uint64_t(blk), buf);
        const int64_t end = std::min<int64_t>(blk * 4 + 4, n);
        for (int64_t i = blk * 4; i < end; ++i) {
            uint64_t r;
            std::memcpy(&r, buf + 8 * (i - blk * 4), 8);
            // round-half-to-even: matches numpy/torch .round() (the
            // reference's fix_prec encode) exactly
            const double v = double(x[i]) * scale;
            const int64_t enc = int64_t(std::llrint(v));
            share0[i] = int64_t(r);
            share1[i] = int64_t(uint64_t(enc) - r);
        }
    }
}

// DICOM percentile contrast stretch: clip u16 pixels at the [lo, hi]
// percentiles and rescale to u8 [0, 255] (torchlib/dicomtools.py:97-117,
// skimage rescale_intensity semantics). Histogram pass + transform pass.
void percentile_stretch_u16(const uint16_t* in, int64_t n, double lo_pct,
                            double hi_pct, uint8_t* out) {
    int64_t hist[65536] = {0};
    for (int64_t i = 0; i < n; ++i) hist[in[i]]++;
    const int64_t lo_rank = int64_t(lo_pct / 100.0 * double(n - 1) + 0.5);
    const int64_t hi_rank = int64_t(hi_pct / 100.0 * double(n - 1) + 0.5);
    int64_t acc = 0;
    uint16_t lo_v = 0, hi_v = 65535;
    bool lo_set = false;
    for (int v = 0; v < 65536; ++v) {
        acc += hist[v];
        if (!lo_set && acc > lo_rank) { lo_v = uint16_t(v); lo_set = true; }
        if (acc > hi_rank) { hi_v = uint16_t(v); break; }
    }
    const double denom = hi_v > lo_v ? double(hi_v - lo_v) : 1.0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        double t = (double(in[i]) - double(lo_v)) / denom;
        t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
        out[i] = uint8_t(t * 255.0 + 0.5);
    }
}

// Batched HWC uint8 bilinear resize (align_corners=False convention,
// matching PIL). in: (n, h, w, c); out: (n, oh, ow, c).
void resize_bilinear_u8(const uint8_t* in, int64_t n, int h, int w, int c,
                        int oh, int ow, uint8_t* out) {
    const double sy = double(h) / double(oh);
    const double sx = double(w) / double(ow);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t img = 0; img < n; ++img) {
        const uint8_t* src = in + img * int64_t(h) * w * c;
        uint8_t* dst = out + img * int64_t(oh) * ow * c;
        for (int oy = 0; oy < oh; ++oy) {
            double fy = (oy + 0.5) * sy - 0.5;
            fy = fy < 0 ? 0 : fy;
            int y0 = int(fy);
            int y1 = std::min(y0 + 1, h - 1);
            double wy = fy - y0;
            for (int ox = 0; ox < ow; ++ox) {
                double fx = (ox + 0.5) * sx - 0.5;
                fx = fx < 0 ? 0 : fx;
                int x0 = int(fx);
                int x1 = std::min(x0 + 1, w - 1);
                double wx = fx - x0;
                for (int ch = 0; ch < c; ++ch) {
                    const double v00 = src[(int64_t(y0) * w + x0) * c + ch];
                    const double v01 = src[(int64_t(y0) * w + x1) * c + ch];
                    const double v10 = src[(int64_t(y1) * w + x0) * c + ch];
                    const double v11 = src[(int64_t(y1) * w + x1) * c + ch];
                    const double top = v00 * (1 - wx) + v01 * wx;
                    const double bot = v10 * (1 - wx) + v11 * wx;
                    dst[(int64_t(oy) * ow + ox) * c + ch] =
                        uint8_t(top * (1 - wy) + bot * wy + 0.5);
                }
            }
        }
    }
}

int primia_native_abi_version(void) { return 1; }

}  // extern "C"
