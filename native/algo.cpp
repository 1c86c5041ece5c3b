// Native host algorithms for the TPU framework's report layer.
//
// watershed_flood: priority-flood watershed with exact
// skimage.segmentation.watershed semantics (lower height floods first;
// FIFO tie-break by insertion order) — the compiled twin of the Python
// reference implementation in unetdc_tpu/ops/watershed.py::watershed
// (parity target: /root/reference/algorithms.py:144-165 watershed_custom).
// The Python heap flood is O(N log N) *interpreted* per pixel — the
// slowest host path left in the framework (512^2 ~ seconds); this is the
// same algorithm at compiled speed (~10 ms).
//
// Build: make -C native (libalgo.so), auto-built on first use.

#include <cstdint>
#include <queue>
#include <vector>

namespace {

struct Node {
    double h;
    int64_t counter;
    int32_t y, x;
};

struct NodeGreater {
    bool operator()(const Node& a, const Node& b) const {
        if (a.h != b.h) return a.h > b.h;
        return a.counter > b.counter;  // FIFO among equal heights
    }
};

}  // namespace

extern "C" int watershed_flood(const double* height, int32_t* labels,
                               const uint8_t* region, int32_t H, int32_t W) {
    std::priority_queue<Node, std::vector<Node>, NodeGreater> heap;
    int64_t counter = 0;

    // outside-region pixels are never filled and end as 0 (the Python
    // version marks them -1 then zeroes; markers there are dropped)
    for (int64_t p = 0; p < (int64_t)H * W; ++p) {
        if (!region[p]) labels[p] = 0;
    }
    // seed in raster order == np.argwhere order == Python counter order
    for (int32_t y = 0; y < H; ++y) {
        for (int32_t x = 0; x < W; ++x) {
            int64_t p = (int64_t)y * W + x;
            if (labels[p] > 0 && region[p]) {
                heap.push({height[p], counter++, y, x});
            }
        }
    }

    static const int32_t dy[4] = {-1, 1, 0, 0};
    static const int32_t dx[4] = {0, 0, -1, 1};
    while (!heap.empty()) {
        Node n = heap.top();
        heap.pop();
        int32_t lab = labels[(int64_t)n.y * W + n.x];
        for (int k = 0; k < 4; ++k) {
            int32_t ny = n.y + dy[k], nx = n.x + dx[k];
            if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
            int64_t q = (int64_t)ny * W + nx;
            if (!region[q] || labels[q] != 0) continue;
            labels[q] = lab;
            heap.push({height[q], counter++, ny, nx});
        }
    }
    return 0;
}
