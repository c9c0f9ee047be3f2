// Native CASA tiled-storage-manager tile assembler.
//
// CASA images store data as a Fortran-ordered grid of Fortran-ordered
// tiles (bit-packed LSB-first per tile for Bool columns).  The Python
// reader assembles them with a per-tile slice-assignment loop
// (spectral_cube_tpu/io/casa_low.py read_tiled_data) — fine for a few
// tiles, minutes for the ~10^5 tiles of a TB-scale image.  This module
// scatters all tiles into the C-ordered output buffer in one
// multithreaded pass, fusing the big-endian byteswap (CASA tables are
// written in either endianness; the table.dat format flag decides).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: g++ -O3 -shared -fPIC -o _casa_tiles.so casa_tiles.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

constexpr int MAXDIM = 8;

struct Geometry {
    int ndim;                 // numpy (reversed-CASA) order
    long np_tile[MAXDIM];     // tile shape, numpy order
    long np_ntile[MAXDIM];    // tile-grid shape, numpy order
    long padded[MAXDIM];      // nt * ts per dim, numpy order
    long dst_stride[MAXDIM];  // element strides of the padded output
    long tile_elems;
    long total_tiles;
};

template <typename T, bool SWAP>
void scatter_tile(const uint8_t* src, T* dst, const Geometry& g,
                  long flat_tile) {
    // tile-grid index: decompose flat_tile in Fortran order over the CASA
    // grid == reversed numpy order
    long np_idx[MAXDIM];
    long rem = flat_tile;
    for (int d = g.ndim - 1; d >= 0; --d) {  // CASA dim 0 first
        np_idx[d] = rem % g.np_ntile[d];
        rem /= g.np_ntile[d];
    }
    long base = 0;
    for (int d = 0; d < g.ndim; ++d)
        base += np_idx[d] * g.np_tile[d] * g.dst_stride[d];

    const long run = g.np_tile[g.ndim - 1];  // contiguous in src AND dst
    const long nruns = g.tile_elems / run;
    const T* s = reinterpret_cast<const T*>(src);
    long counters[MAXDIM] = {0};
    for (long r = 0; r < nruns; ++r) {
        long off = base;
        for (int d = 0; d < g.ndim - 1; ++d)
            off += counters[d] * g.dst_stride[d];
        const T* sp = s + r * run;
        T* dp = dst + off;
        if (!SWAP) {
            std::memcpy(dp, sp, run * sizeof(T));
        } else {
            for (long i = 0; i < run; ++i) {
                if (sizeof(T) == 4) {
                    uint32_t v;
                    std::memcpy(&v, sp + i, 4);
                    v = bswap32(v);
                    std::memcpy(dp + i, &v, 4);
                } else {
                    uint64_t v;
                    std::memcpy(&v, sp + i, 8);
                    v = bswap64(v);
                    std::memcpy(dp + i, &v, 8);
                }
            }
        }
        // advance the multi-index over dims [0, ndim-2]
        for (int d = g.ndim - 2; d >= 0; --d) {
            if (++counters[d] < g.np_tile[d]) break;
            counters[d] = 0;
        }
    }
}

void scatter_tile_bool(const uint8_t* src, uint8_t* dst, const Geometry& g,
                       long flat_tile) {
    long np_idx[MAXDIM];
    long rem = flat_tile;
    for (int d = g.ndim - 1; d >= 0; --d) {
        np_idx[d] = rem % g.np_ntile[d];
        rem /= g.np_ntile[d];
    }
    long base = 0;
    for (int d = 0; d < g.ndim; ++d)
        base += np_idx[d] * g.np_tile[d] * g.dst_stride[d];
    const long run = g.np_tile[g.ndim - 1];
    const long nruns = g.tile_elems / run;
    long counters[MAXDIM] = {0};
    for (long r = 0; r < nruns; ++r) {
        long off = base;
        for (int d = 0; d < g.ndim - 1; ++d)
            off += counters[d] * g.dst_stride[d];
        uint8_t* dp = dst + off;
        const long bit0 = r * run;  // bit index within the tile, LSB-first
        for (long i = 0; i < run; ++i) {
            const long b = bit0 + i;
            dp[i] = (src[b >> 3] >> (b & 7)) & 1;
        }
        for (int d = g.ndim - 2; d >= 0; --d) {
            if (++counters[d] < g.np_tile[d]) break;
            counters[d] = 0;
        }
    }
}

template <typename Fn>
void parallel_tiles(long total, int nthreads, Fn fn) {
    if (nthreads <= 0)
        nthreads = (int)std::thread::hardware_concurrency();
    nthreads = std::max(1, std::min<int>(nthreads, (int)total));
    if (nthreads == 1) {
        for (long t = 0; t < total; ++t) fn(t);
        return;
    }
    std::vector<std::thread> pool;
    long chunk = (total + nthreads - 1) / nthreads;
    for (int w = 0; w < nthreads; ++w) {
        long lo = w * chunk, hi = std::min<long>(total, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back([=] { for (long t = lo; t < hi; ++t) fn(t); });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// dtype_code: 4 = float32, 8 = float64 (byte width); 1 = bit-packed bool.
// casa_shape/tile_shape are in CASA (Fortran) order, length ndim.
// out is the C-ordered padded array (numpy order, dims = reversed
// ntiles*tile); bool output is uint8 0/1.
int casa_assemble_tiles(const uint8_t* payload, long payload_len,
                        int ndim, const long* casa_shape,
                        const long* tile_shape, int dtype_code,
                        int big_endian, void* out, int nthreads) {
    if (ndim < 1 || ndim > MAXDIM) return 1;
    Geometry g;
    g.ndim = ndim;
    g.tile_elems = 1;
    g.total_tiles = 1;
    for (int d = 0; d < ndim; ++d) {
        // numpy order reverses CASA order
        long ts = tile_shape[ndim - 1 - d];
        long cs = casa_shape[ndim - 1 - d];
        g.np_tile[d] = ts;
        g.np_ntile[d] = (cs + ts - 1) / ts;
        g.padded[d] = g.np_ntile[d] * ts;
        g.tile_elems *= ts;
        g.total_tiles *= g.np_ntile[d];
    }
    g.dst_stride[ndim - 1] = 1;
    for (int d = ndim - 2; d >= 0; --d)
        g.dst_stride[d] = g.dst_stride[d + 1] * g.padded[d + 1];

    const long tile_bytes = dtype_code == 1
        ? (g.tile_elems + 7) / 8 : g.tile_elems * dtype_code;
    if (g.total_tiles * tile_bytes > payload_len) return 2;

    // native-endian check: payloads are tagged by the table's format flag
    const bool swap = [&] {
        const uint16_t one = 1;
        const bool host_le = *reinterpret_cast<const uint8_t*>(&one) == 1;
        return big_endian ? host_le : !host_le;
    }();

    if (dtype_code == 1) {
        parallel_tiles(g.total_tiles, nthreads, [&](long t) {
            scatter_tile_bool(payload + t * tile_bytes,
                              reinterpret_cast<uint8_t*>(out), g, t);
        });
    } else if (dtype_code == 4) {
        parallel_tiles(g.total_tiles, nthreads, [&](long t) {
            if (swap)
                scatter_tile<uint32_t, true>(
                    payload + t * tile_bytes,
                    reinterpret_cast<uint32_t*>(out), g, t);
            else
                scatter_tile<uint32_t, false>(
                    payload + t * tile_bytes,
                    reinterpret_cast<uint32_t*>(out), g, t);
        });
    } else if (dtype_code == 8) {
        parallel_tiles(g.total_tiles, nthreads, [&](long t) {
            if (swap)
                scatter_tile<uint64_t, true>(
                    payload + t * tile_bytes,
                    reinterpret_cast<uint64_t*>(out), g, t);
            else
                scatter_tile<uint64_t, false>(
                    payload + t * tile_bytes,
                    reinterpret_cast<uint64_t*>(out), g, t);
        });
    } else {
        return 3;
    }
    return 0;
}

}  // extern "C"
