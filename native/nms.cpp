// Greedy non-maximum suppression (C++ equivalent of the reference's Cython
// util/nms.pyx:17-68, Fast R-CNN +1 area convention).
//
// C ABI: greedy_nms(dets[N*5], N, thresh, keep_out[N]) -> number kept.
// dets rows: (x1, y1, x2, y2, score).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

int greedy_nms(const float* dets, int n, float thresh, int* keep_out) {
    if (n <= 0) return 0;
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::sort(order.begin(), order.end(), [&](int a, int b) {
        return dets[a * 5 + 4] > dets[b * 5 + 4];
    });
    std::vector<double> areas(n);
    for (int i = 0; i < n; ++i) {
        const float* d = dets + i * 5;
        areas[i] = (double)(d[2] - d[0] + 1.0f) * (double)(d[3] - d[1] + 1.0f);
    }
    std::vector<char> suppressed(n, 0);
    int kept = 0;
    for (int oi = 0; oi < n; ++oi) {
        int i = order[oi];
        if (suppressed[i]) continue;
        keep_out[kept++] = i;
        const float* di = dets + i * 5;
        for (int oj = oi + 1; oj < n; ++oj) {
            int j = order[oj];
            if (suppressed[j]) continue;
            const float* dj = dets + j * 5;
            double xx1 = std::max(di[0], dj[0]);
            double yy1 = std::max(di[1], dj[1]);
            double xx2 = std::min(di[2], dj[2]);
            double yy2 = std::min(di[3], dj[3]);
            double w = std::max(0.0, xx2 - xx1 + 1.0);
            double h = std::max(0.0, yy2 - yy1 + 1.0);
            double inter = w * h;
            double ovr = inter / (areas[i] + areas[j] - inter);
            if (ovr > thresh) suppressed[j] = 1;
        }
    }
    return kept;
}

}  // extern "C"
