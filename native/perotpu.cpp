// Native host runtime kernels for pero_ocr_tpu.
//
// The reference delegates its host-side hot loops to numba/scipy
// (SURVEY.md §2.9: connected-components labeling, Levenshtein DP, CTC
// Viterbi); here they are C++ with a plain C ABI consumed through
// ctypes (pero_ocr_tpu/utils/native.py).  Python fallbacks exist for
// every entry point, so the shared library is an accelerator, not a
// hard dependency.
//
// Build: `make -C native` -> native/libperotpu.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Connected components, 8-connectivity, two-pass union-find.
// mask: h*w uint8 (nonzero = foreground); labels_out: h*w int32.
// Returns the number of components.
// ---------------------------------------------------------------------
static inline int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int32_t next = parent[x];
        parent[x] = root;
        x = next;
    }
    return root;
}

static inline void uf_union(std::vector<int32_t>& parent, int32_t a, int32_t b) {
    int32_t ra = uf_find(parent, a);
    int32_t rb = uf_find(parent, b);
    if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
}

int32_t cc_label_u8(const uint8_t* mask, int32_t h, int32_t w,
                    int32_t* labels_out) {
    std::vector<int32_t> parent;
    parent.reserve(1024);
    parent.push_back(0);  // background sentinel

    // First pass: provisional labels + equivalences.
    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            const int64_t idx = (int64_t)y * w + x;
            if (!mask[idx]) {
                labels_out[idx] = 0;
                continue;
            }
            int32_t neighbors[4];
            int n_neighbors = 0;
            if (y > 0) {
                const int64_t up = idx - w;
                if (x > 0 && labels_out[up - 1]) neighbors[n_neighbors++] = labels_out[up - 1];
                if (labels_out[up]) neighbors[n_neighbors++] = labels_out[up];
                if (x + 1 < w && labels_out[up + 1]) neighbors[n_neighbors++] = labels_out[up + 1];
            }
            if (x > 0 && labels_out[idx - 1]) neighbors[n_neighbors++] = labels_out[idx - 1];

            if (n_neighbors == 0) {
                const int32_t fresh = (int32_t)parent.size();
                parent.push_back(fresh);
                labels_out[idx] = fresh;
            } else {
                int32_t lo = neighbors[0];
                for (int i = 1; i < n_neighbors; ++i) lo = std::min(lo, neighbors[i]);
                labels_out[idx] = lo;
                for (int i = 0; i < n_neighbors; ++i) uf_union(parent, lo, neighbors[i]);
            }
        }
    }

    // Flatten equivalences into dense labels 1..n.
    std::vector<int32_t> dense(parent.size(), 0);
    int32_t next_label = 0;
    for (size_t i = 1; i < parent.size(); ++i) {
        const int32_t root = uf_find(parent, (int32_t)i);
        if (dense[root] == 0) dense[root] = ++next_label;
        dense[i] = dense[root];
    }

    const int64_t total = (int64_t)h * w;
    for (int64_t i = 0; i < total; ++i) {
        if (labels_out[i]) labels_out[i] = dense[labels_out[i]];
    }
    return next_label;
}

// ---------------------------------------------------------------------
// Levenshtein distance over int32 symbol sequences (rolling 1-row DP).
// ---------------------------------------------------------------------
int32_t levenshtein_i32(const int32_t* a, int32_t n, const int32_t* b,
                        int32_t m) {
    if (n == 0) return m;
    if (m == 0) return n;
    std::vector<int32_t> row(m + 1);
    for (int32_t j = 0; j <= m; ++j) row[j] = j;
    for (int32_t i = 1; i <= n; ++i) {
        int32_t diag = row[0];
        row[0] = i;
        for (int32_t j = 1; j <= m; ++j) {
            const int32_t sub = diag + (a[i - 1] != b[j - 1]);
            diag = row[j];
            row[j] = std::min(std::min(row[j] + 1, row[j - 1] + 1), sub);
        }
    }
    return row[m];
}

// Batched: distances[i] = lev(a_i, b_i), sequences packed with offsets.
void levenshtein_batch_i32(const int32_t* data_a, const int32_t* offsets_a,
                           const int32_t* data_b, const int32_t* offsets_b,
                           int32_t count, int32_t* distances_out) {
    for (int32_t i = 0; i < count; ++i) {
        distances_out[i] = levenshtein_i32(
            data_a + offsets_a[i], offsets_a[i + 1] - offsets_a[i],
            data_b + offsets_b[i], offsets_b[i + 1] - offsets_b[i]);
    }
}

// ---------------------------------------------------------------------
// CTC Viterbi forced alignment over the blank-interleaved chain.
// neg_logprobs_states: t*s row-major costs already gathered per state;
// skip_ok: s bytes; path_out: t int32 state indices.
// Returns 0 on success, -1 when no valid path exists.
// ---------------------------------------------------------------------
int32_t viterbi_ctc_f32(const float* neg_logprobs_states, int32_t t,
                        int32_t s, const uint8_t* skip_ok,
                        int32_t* path_out) {
    const float INF = 1e30f;
    std::vector<float> cost(s, INF);
    std::vector<float> next(s);
    std::vector<int8_t> deltas((size_t)t * s, 0);

    cost[0] = neg_logprobs_states[0];
    if (s > 1) cost[1] = neg_logprobs_states[1];

    for (int32_t i = 1; i < t; ++i) {
        const float* frame = neg_logprobs_states + (size_t)i * s;
        int8_t* drow = deltas.data() + (size_t)i * s;
        for (int32_t k = 0; k < s; ++k) {
            float best = cost[k];
            int8_t d = 0;
            if (k >= 1 && cost[k - 1] < best) { best = cost[k - 1]; d = 1; }
            if (k >= 2 && skip_ok[k] && cost[k - 2] < best) { best = cost[k - 2]; d = 2; }
            next[k] = best + frame[k];
            drow[k] = d;
        }
        std::swap(cost, next);
    }

    float best = INF;
    int32_t state = -1;
    for (int32_t k = std::max(0, s - 2); k < s; ++k) {
        if (cost[k] < best) { best = cost[k]; state = k; }
    }
    if (state < 0 || best >= INF * 0.5f) return -1;

    for (int32_t i = t - 1; i >= 0; --i) {
        path_out[i] = state;
        if (i > 0) state -= deltas[(size_t)i * s + state];
    }
    return 0;
}

}  // extern "C"
