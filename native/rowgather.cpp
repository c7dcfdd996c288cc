// Multithreaded uint8 row-gather for the streaming data path.
//
// The chunked-streaming epoch (clsurvey_tpu/engine/train.py
// train_epoch_chunked) host-gathers `images[perm_chunk]` before each
// device_put. numpy fancy indexing is single-threaded; for the 224px
// protocols a chunk is ~1 GB and the gather competes with device compute
// for wall-clock. This is the native equivalent of the reference's
// multi-worker DataLoader collate (ref:src/methods/rehearsal/
// main_rehearsal.py:181-184 num_workers=4): N threads each memcpy a
// contiguous span of destination rows.
//
// Exposed as extern "C" for ctypes. Build: `make -C native`.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i, :] = src[idx[i], :] for i in [0, n_idx).
// src has src_rows rows of row_bytes bytes each. Returns 0 on success,
// -1 if any index is out of [0, src_rows).
int rowgather_u8(const uint8_t* src, int64_t src_rows, int64_t row_bytes,
                 const int64_t* idx, int64_t n_idx, uint8_t* dst,
                 int n_threads) {
    for (int64_t i = 0; i < n_idx; ++i) {
        if (idx[i] < 0 || idx[i] >= src_rows) return -1;
    }
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n_idx) n_threads = static_cast<int>(n_idx > 0 ? n_idx : 1);

    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                        static_cast<size_t>(row_bytes));
        }
    };

    if (n_threads == 1) {
        worker(0, n_idx);
        return 0;
    }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    int64_t per = (n_idx + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * per;
        int64_t hi = lo + per < n_idx ? lo + per : n_idx;
        if (lo >= hi) break;
        threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
    return 0;
}

}  // extern "C"
