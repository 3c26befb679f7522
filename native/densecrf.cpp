// DenseCRF2D mean-field with permutohedral-lattice filtering.
//
// C++ equivalent of the reference's pydensecrf usage
// (trainval_model.py:246-259): 2 classes, unary = -log([1-p, p]),
// PairwiseGaussian(sxy, compat) + PairwiseBilateral(sxy, srgb, compat),
// N mean-field iterations, symmetric kernel normalization, Potts
// compatibility (out = -w * filtered) — matching Kraehenbuehl & Koltun's
// public densecrf v2 semantics that pydensecrf wraps.
//
// Permutohedral lattice: Adams, Baek, Davis, "Fast High-Dimensional
// Filtering Using the Permutohedral Lattice" (EG 2010) — standard
// splat / blur / slice implementation written from scratch.
//
// C ABI:
//   int densecrf2d_refine(const unsigned char* rgb, const float* prob,
//                         float* out, int H, int W,
//                         float sxy_g, float compat_g,
//                         float sxy_b, float srgb, float compat_b,
//                         int iters);
// Returns 0 on success; `out` receives the refined foreground probability.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Permutohedral lattice
// ---------------------------------------------------------------------------

struct LatticeKey {
    std::vector<short> key;
    bool operator==(const LatticeKey& o) const { return key == o.key; }
};

struct LatticeKeyHash {
    size_t operator()(const LatticeKey& k) const {
        size_t h = 14695981039346656037ull;
        for (short v : k.key) {
            h ^= (size_t)(uint16_t)v;
            h *= 1099511628211ull;
        }
        return h;
    }
};

class Permutohedral {
  public:
    // features: [N, d]
    void init(const float* features, int N, int d) {
        N_ = N;
        d_ = d;
        offset_.assign((size_t)N * (d + 1), 0);
        weight_.assign((size_t)N * (d + 1), 0.f);

        // Embedding scale factors: the elevated basis E has columns of
        // squared norm (i+1)(i+2); scaling by sqrt(2/3)*(d+1) makes the
        // [1 2 1] blur over the d+1 lattice directions equivalent to a
        // unit-variance Gaussian in feature space (Adams et al. 2010, §4).
        std::vector<float> scale(d);
        float inv_std = std::sqrt(2.0f / 3.0f) * (float)(d + 1);
        for (int i = 0; i < d; ++i)
            scale[i] = inv_std / std::sqrt((float)(i + 1) * (i + 2));

        std::vector<float> elevated(d + 1);
        std::vector<float> rem0(d + 1);
        std::vector<int> rank(d + 1);
        std::vector<short> canonical((d + 1) * (d + 1));
        for (int i = 0; i <= d; ++i) {
            for (int j = 0; j <= d - i; ++j) canonical[i * (d + 1) + j] = i;
            for (int j = d - i + 1; j <= d; ++j)
                canonical[i * (d + 1) + j] = i - (d + 1);
        }

        std::unordered_map<LatticeKey, int, LatticeKeyHash> hash;
        hash.reserve((size_t)N * 2);
        LatticeKey key;
        key.key.resize(d);
        std::vector<float> barycentric(d + 2);

        for (int n = 0; n < N; ++n) {
            const float* f = features + (size_t)n * d;
            // Elevate into H_d (E f): standard recursive formula
            float sm = 0.f;
            for (int j = d; j > 0; --j) {
                float cf = f[j - 1] * scale[j - 1];
                elevated[j] = sm - (float)j * cf;
                sm += cf;
            }
            elevated[0] = sm;

            // find closest 0-colored simplex: round to nearest multiple of d+1
            float down_factor = 1.0f / (d + 1);
            float up_factor = (float)(d + 1);
            int sum = 0;
            for (int i = 0; i <= d; ++i) {
                float v = down_factor * elevated[i];
                float up = std::ceil(v) * up_factor;
                float down = std::floor(v) * up_factor;
                rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
                sum += (int)(rem0[i] * down_factor);
            }

            // rank differential
            for (int i = 0; i <= d; ++i) rank[i] = 0;
            for (int i = 0; i < d; ++i) {
                double di = elevated[i] - rem0[i];
                for (int j = i + 1; j <= d; ++j) {
                    if (di < elevated[j] - rem0[j]) rank[i]++;
                    else rank[j]++;
                }
            }
            // fix rounding so the point sums to zero
            for (int i = 0; i <= d; ++i) {
                rank[i] += sum;
                if (rank[i] < 0) {
                    rank[i] += d + 1;
                    rem0[i] += (float)(d + 1);
                } else if (rank[i] > d) {
                    rank[i] -= d + 1;
                    rem0[i] -= (float)(d + 1);
                }
            }

            // barycentric coordinates
            std::fill(barycentric.begin(), barycentric.end(), 0.f);
            for (int i = 0; i <= d; ++i) {
                float v = (elevated[i] - rem0[i]) * down_factor;
                barycentric[d - rank[i]] += v;
                barycentric[d - rank[i] + 1] -= v;
            }
            barycentric[0] += 1.0f + barycentric[d + 1];

            // splat to the d+1 simplex vertices
            for (int remainder = 0; remainder <= d; ++remainder) {
                for (int i = 0; i < d; ++i) {
                    key.key[i] = (short)(rem0[i]
                        + canonical[remainder * (d + 1) + rank[i]]);
                }
                auto it = hash.find(key);
                int idx;
                if (it == hash.end()) {
                    idx = (int)hash.size();
                    hash.emplace(key, idx);
                    keys_.insert(keys_.end(), key.key.begin(), key.key.end());
                } else {
                    idx = it->second;
                }
                offset_[(size_t)n * (d + 1) + remainder] = idx;
                weight_[(size_t)n * (d + 1) + remainder] =
                    barycentric[remainder];
            }
        }
        M_ = (int)hash.size();

        // precompute blur neighbors along each lattice direction
        blur_n1_.assign((size_t)(d + 1) * M_, -1);
        blur_n2_.assign((size_t)(d + 1) * M_, -1);
        LatticeKey nk;
        nk.key.resize(d);
        for (int dir = 0; dir <= d; ++dir) {
            for (int m = 0; m < M_; ++m) {
                const short* kk = &keys_[(size_t)m * d];
                // neighbor +: key + 1 except dir gets -d ; neighbor -: inverse
                for (int i = 0; i < d; ++i)
                    nk.key[i] = (short)(kk[i] + 1);
                if (dir < d) nk.key[dir] = (short)(kk[dir] - d);
                auto it = hash.find(nk);
                blur_n1_[(size_t)dir * M_ + m] =
                    (it == hash.end()) ? -1 : it->second;
                for (int i = 0; i < d; ++i)
                    nk.key[i] = (short)(kk[i] - 1);
                if (dir < d) nk.key[dir] = (short)(kk[dir] + d);
                it = hash.find(nk);
                blur_n2_[(size_t)dir * M_ + m] =
                    (it == hash.end()) ? -1 : it->second;
            }
        }
    }

    // filter `vdim` channels: in/out [N, vdim]
    void compute(const float* in, float* out, int vdim) const {
        std::vector<float> values((size_t)(M_ + 2) * vdim, 0.f);
        std::vector<float> new_values((size_t)(M_ + 2) * vdim, 0.f);

        // splat
        for (int n = 0; n < N_; ++n) {
            for (int j = 0; j <= d_; ++j) {
                int o = offset_[(size_t)n * (d_ + 1) + j] + 1;
                float w = weight_[(size_t)n * (d_ + 1) + j];
                for (int v = 0; v < vdim; ++v)
                    values[(size_t)o * vdim + v] +=
                        w * in[(size_t)n * vdim + v];
            }
        }

        // blur along each lattice direction: [1 2 1] kernel
        for (int dir = 0; dir <= d_; ++dir) {
            for (int m = 0; m < M_; ++m) {
                int n1 = blur_n1_[(size_t)dir * M_ + m];
                int n2 = blur_n2_[(size_t)dir * M_ + m];
                const float* v0 = &values[(size_t)(m + 1) * vdim];
                const float* v1 = &values[(size_t)(n1 + 1) * vdim];
                const float* v2 = &values[(size_t)(n2 + 1) * vdim];
                float* nv = &new_values[(size_t)(m + 1) * vdim];
                for (int v = 0; v < vdim; ++v)
                    nv[v] = v0[v] + 0.5f * (v1[v] + v2[v]);
            }
            values.swap(new_values);
        }

        // slice (alpha corrects the [1 2 1]^{d+1} blur gain)
        float alpha = 1.0f / (1.0f + std::pow(2.0f, -(float)d_));
        for (int n = 0; n < N_; ++n) {
            for (int v = 0; v < vdim; ++v) out[(size_t)n * vdim + v] = 0.f;
            for (int j = 0; j <= d_; ++j) {
                int o = offset_[(size_t)n * (d_ + 1) + j] + 1;
                float w = weight_[(size_t)n * (d_ + 1) + j];
                for (int v = 0; v < vdim; ++v)
                    out[(size_t)n * vdim + v] +=
                        w * values[(size_t)o * vdim + v] * alpha;
            }
        }
    }

  private:
    int N_ = 0, d_ = 0, M_ = 0;
    std::vector<int> offset_;
    std::vector<float> weight_;
    std::vector<short> keys_;
    std::vector<int> blur_n1_, blur_n2_;
};

// symmetric-normalized pairwise message (densecrf v2 semantics)
struct PairwiseKernel {
    Permutohedral lattice;
    std::vector<float> norm;  // 1/sqrt(K 1)
    float compat;
    int N;

    void init(const float* features, int n, int d, float w) {
        compat = w;
        N = n;
        lattice.init(features, n, d);
        std::vector<float> ones(n, 1.0f);
        norm.assign(n, 0.f);
        lattice.compute(ones.data(), norm.data(), 1);
        for (int i = 0; i < n; ++i)
            norm[i] = 1.0f / std::sqrt(norm[i] + 1e-20f);
    }

    // accumulates -compat * filter(Q) into `out` for each of 2 labels
    void apply(const float* q, float* out) const {
        std::vector<float> tmp((size_t)N * 2), tmp2((size_t)N * 2);
        for (int i = 0; i < N; ++i) {
            tmp[i * 2] = q[i * 2] * norm[i];
            tmp[i * 2 + 1] = q[i * 2 + 1] * norm[i];
        }
        lattice.compute(tmp.data(), tmp2.data(), 2);
        for (int i = 0; i < N; ++i) {
            out[i * 2] += -compat * tmp2[i * 2] * norm[i];
            out[i * 2 + 1] += -compat * tmp2[i * 2 + 1] * norm[i];
        }
    }
};

}  // namespace

extern "C" {

// Raw lattice filter (test/diagnostic surface): out = approx(K @ values)
// where K_ij = exp(-||f_i - f_j||^2 / 2), self term included.
int permutohedral_filter(const float* features, const float* values,
                         float* out, int N, int d, int vdim) {
    if (N <= 0 || d <= 0 || vdim <= 0) return 1;
    Permutohedral p;
    p.init(features, N, d);
    p.compute(values, out, vdim);
    return 0;
}

int densecrf2d_refine(const unsigned char* rgb, const float* prob,
                      float* out, int H, int W,
                      float sxy_g, float compat_g,
                      float sxy_b, float srgb, float compat_b,
                      int iters) {
    if (H <= 0 || W <= 0) return 1;
    const int N = H * W;

    // unary = -log(p) with clipping (trainval_model.py:251-253 uses the
    // sigmoid map as P(fg); labels: 0 = bg, 1 = fg)
    std::vector<float> unary((size_t)N * 2);
    for (int i = 0; i < N; ++i) {
        float p = prob[i];
        if (p < 1e-8f) p = 1e-8f;
        if (p > 1.0f - 1e-8f) p = 1.0f - 1e-8f;
        unary[i * 2] = -std::log(1.0f - p);
        unary[i * 2 + 1] = -std::log(p);
    }

    // kernels
    std::vector<float> feat_g((size_t)N * 2);
    for (int y = 0; y < H; ++y)
        for (int x = 0; x < W; ++x) {
            feat_g[((size_t)y * W + x) * 2] = (float)x / sxy_g;
            feat_g[((size_t)y * W + x) * 2 + 1] = (float)y / sxy_g;
        }
    PairwiseKernel kg;
    kg.init(feat_g.data(), N, 2, compat_g);

    std::vector<float> feat_b((size_t)N * 5);
    for (int y = 0; y < H; ++y)
        for (int x = 0; x < W; ++x) {
            size_t i = (size_t)y * W + x;
            feat_b[i * 5] = (float)x / sxy_b;
            feat_b[i * 5 + 1] = (float)y / sxy_b;
            feat_b[i * 5 + 2] = (float)rgb[i * 3] / srgb;
            feat_b[i * 5 + 3] = (float)rgb[i * 3 + 1] / srgb;
            feat_b[i * 5 + 4] = (float)rgb[i * 3 + 2] / srgb;
        }
    PairwiseKernel kb;
    kb.init(feat_b.data(), N, 5, compat_b);

    // mean field
    std::vector<float> q((size_t)N * 2), pair((size_t)N * 2);
    for (int i = 0; i < N; ++i) {  // Q init = softmax(-U)
        float a = -unary[i * 2], b = -unary[i * 2 + 1];
        float m = a > b ? a : b;
        float ea = std::exp(a - m), eb = std::exp(b - m);
        q[i * 2] = ea / (ea + eb);
        q[i * 2 + 1] = eb / (ea + eb);
    }
    for (int it = 0; it < iters; ++it) {
        std::fill(pair.begin(), pair.end(), 0.f);
        kg.apply(q.data(), pair.data());
        kb.apply(q.data(), pair.data());
        for (int i = 0; i < N; ++i) {
            float a = -unary[i * 2] - pair[i * 2];
            float b = -unary[i * 2 + 1] - pair[i * 2 + 1];
            float m = a > b ? a : b;
            float ea = std::exp(a - m), eb = std::exp(b - m);
            q[i * 2] = ea / (ea + eb);
            q[i * 2 + 1] = eb / (ea + eb);
        }
    }
    for (int i = 0; i < N; ++i) out[i] = q[i * 2 + 1];
    return 0;
}

}  // extern "C"
