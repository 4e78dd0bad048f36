// Host-side paged KV copy: the native tier of the swap path.
//
// TPU-native counterpart of the reference's C++ swap extension
// (csrc/src/block_swapping.cpp:22-85): where the reference coalesces runs of
// consecutive block ids into single cudaMemcpyAsync calls, this coalesces runs
// into single memcpy calls over the host staging buffer, parallelized across
// layers with OpenMP. Device<->host transfer itself is JAX's job
// (device_put / device_get); this handles the host-side scatter/gather
// between the transfer staging buffer and the CPU swap cache, which is the
// numpy-fancy-indexing bottleneck it replaces.
//
// Memory layout (both buffers): [n_layers, n_slots, inner...] contiguous,
// where a page is `page_bytes` contiguous bytes within a layer.
//
// Build: g++ -O3 -shared -fPIC -fopenmp page_copy.cpp -o libpagecopy.so

#include <cstdint>
#include <cstring>

extern "C" {

// Copy n_pages pages per layer from src to dst.
// dst_pages/src_pages: page indices within a layer (page i of the copy goes
// src page src_pages[i] -> dst page dst_pages[i]).
// *_layer_stride: bytes between consecutive layers in each buffer.
void copy_pages(char* dst, const char* src,
                const int32_t* dst_pages, const int32_t* src_pages,
                int64_t n_pages, int64_t page_bytes,
                int64_t dst_layer_stride, int64_t src_layer_stride,
                int64_t n_layers) {
    if (n_pages <= 0 || n_layers <= 0) return;

    // Coalesce runs of consecutive (src, dst) page pairs (reference
    // block_swapping.cpp:36-47): one memcpy per run per layer.
    // Worst case every page is its own run.
    int64_t max_runs = n_pages;
    int64_t* run_src = new int64_t[max_runs];
    int64_t* run_dst = new int64_t[max_runs];
    int64_t* run_len = new int64_t[max_runs];
    int64_t n_runs = 0;
    int64_t i = 0;
    while (i < n_pages) {
        int64_t j = i + 1;
        while (j < n_pages && src_pages[j] == src_pages[j - 1] + 1
                           && dst_pages[j] == dst_pages[j - 1] + 1) {
            ++j;
        }
        run_src[n_runs] = src_pages[i];
        run_dst[n_runs] = dst_pages[i];
        run_len[n_runs] = j - i;
        ++n_runs;
        i = j;
    }

    #pragma omp parallel for collapse(2) schedule(static)
    for (int64_t l = 0; l < n_layers; ++l) {
        for (int64_t r = 0; r < n_runs; ++r) {
            std::memcpy(dst + l * dst_layer_stride + run_dst[r] * page_bytes,
                        src + l * src_layer_stride + run_src[r] * page_bytes,
                        run_len[r] * page_bytes);
        }
    }

    delete[] run_src;
    delete[] run_dst;
    delete[] run_len;
}

}  // extern "C"
