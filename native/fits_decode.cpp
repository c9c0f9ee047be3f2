// Native FITS payload decoder: fused mmap read + big-endian byteswap +
// BSCALE/BZERO application, parallelized across threads.
//
// The reference library gets FITS decoding from astropy's C FITS reader +
// numpy byteswap (single-threaded, two passes over the data).  TB-scale
// cube ingest is bandwidth-bound on exactly this path, so this module does
// the whole decode in one multithreaded pass: mmap the file, swap each
// element, convert to the output float type, apply scale/zero, write to the
// destination buffer (which feeds jax.device_put without further copies).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: g++ -O3 -march=native -shared -fPIC -o _fits_decode.so fits_decode.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>
#include <algorithm>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

template <typename Fn>
void parallel_for(size_t n, int nthreads, Fn fn) {
    if (nthreads <= 1 || n < (1u << 16)) {
        fn(size_t(0), n);
        return;
    }
    nthreads = std::min<size_t>(nthreads, (n + 65535) / 65536);
    std::vector<std::thread> threads;
    size_t chunk = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        size_t lo = t * chunk;
        size_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=] { fn(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

struct Mapped {
    void* base = nullptr;
    size_t len = 0;
    const uint8_t* data = nullptr;
    int fd = -1;
    bool ok = false;
};

Mapped map_range(const char* path, size_t offset, size_t nbytes) {
    Mapped m;
    m.fd = ::open(path, O_RDONLY);
    if (m.fd < 0) return m;
    // refuse to map past EOF: touching a page beyond the last
    // file-backed page raises SIGBUS and kills the process (a truncated
    // FITS payload must fail over to the numpy path instead)
    struct stat st;
    if (::fstat(m.fd, &st) != 0 ||
        offset + nbytes > static_cast<size_t>(st.st_size)) {
        ::close(m.fd);
        return m;
    }
    long page = sysconf(_SC_PAGESIZE);
    size_t aligned = offset & ~size_t(page - 1);
    size_t shift = offset - aligned;
    m.len = nbytes + shift;
    m.base = ::mmap(nullptr, m.len, PROT_READ, MAP_PRIVATE, m.fd, aligned);
    if (m.base == MAP_FAILED) {
        ::close(m.fd);
        m.base = nullptr;
        return m;
    }
    ::madvise(m.base, m.len, MADV_SEQUENTIAL | MADV_WILLNEED);
    m.data = static_cast<const uint8_t*>(m.base) + shift;
    m.ok = true;
    return m;
}

void unmap(Mapped& m) {
    if (m.base) ::munmap(m.base, m.len);
    if (m.fd >= 0) ::close(m.fd);
}

template <typename In, typename Out, typename Swap>
int decode(const char* path, size_t offset, size_t count, double bscale,
           double bzero, Out* out, int nthreads, Swap swapfn) {
    Mapped m = map_range(path, offset, count * sizeof(In));
    if (!m.ok) return -1;
    const In* src = reinterpret_cast<const In*>(m.data);
    const bool scaled = (bscale != 1.0) || (bzero != 0.0);
    parallel_for(count, nthreads, [&](size_t lo, size_t hi) {
        if (!scaled) {
            for (size_t i = lo; i < hi; ++i) {
                In v = src[i];
                v = swapfn(v);
                out[i] = static_cast<Out>(reinterpret_cast<In&>(v));
            }
        } else {
            for (size_t i = lo; i < hi; ++i) {
                In v = src[i];
                v = swapfn(v);
                out[i] = static_cast<Out>(
                    static_cast<double>(reinterpret_cast<In&>(v)) * bscale +
                    bzero);
            }
        }
    });
    unmap(m);
    return 0;
}

// float payloads need a bit-level swap then reinterpretation
template <typename Out>
int decode_f32(const char* path, size_t offset, size_t count, double bscale,
               double bzero, Out* out, int nthreads) {
    Mapped m = map_range(path, offset, count * 4);
    if (!m.ok) return -1;
    const uint32_t* src = reinterpret_cast<const uint32_t*>(m.data);
    const bool scaled = (bscale != 1.0) || (bzero != 0.0);
    parallel_for(count, nthreads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            uint32_t v = bswap32(src[i]);
            float f;
            std::memcpy(&f, &v, 4);
            out[i] = scaled ? static_cast<Out>(double(f) * bscale + bzero)
                            : static_cast<Out>(f);
        }
    });
    unmap(m);
    return 0;
}

template <typename Out>
int decode_f64(const char* path, size_t offset, size_t count, double bscale,
               double bzero, Out* out, int nthreads) {
    Mapped m = map_range(path, offset, count * 8);
    if (!m.ok) return -1;
    const uint64_t* src = reinterpret_cast<const uint64_t*>(m.data);
    const bool scaled = (bscale != 1.0) || (bzero != 0.0);
    parallel_for(count, nthreads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            uint64_t v = bswap64(src[i]);
            double f;
            std::memcpy(&f, &v, 8);
            out[i] = scaled ? static_cast<Out>(f * bscale + bzero)
                            : static_cast<Out>(f);
        }
    });
    unmap(m);
    return 0;
}

}  // namespace

extern "C" {

// bitpix: 16/32/64 (ints), -32/-64 (floats). out is float32 (out_double=0)
// or float64 (out_double=1). Returns 0 on success.
int fits_decode_payload(const char* path, size_t offset, size_t count,
                        int bitpix, double bscale, double bzero, void* out,
                        int out_double, int nthreads) {
#if defined(__BYTE_ORDER__) && (__BYTE_ORDER__ != __ORDER_LITTLE_ENDIAN__)
    // the decode kernels unconditionally byteswap the big-endian FITS
    // payload, which is only correct on little-endian hosts; on a
    // big-endian host fail over to the (endian-correct) numpy path
    return 3;
#endif
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    if (out_double) {
        double* o = static_cast<double*>(out);
        switch (bitpix) {
            case -32: return decode_f32(path, offset, count, bscale, bzero, o, nthreads);
            case -64: return decode_f64(path, offset, count, bscale, bzero, o, nthreads);
            case 16: return decode<int16_t>(path, offset, count, bscale, bzero, o, nthreads, [](int16_t v) { return (int16_t)bswap16((uint16_t)v); });
            case 32: return decode<int32_t>(path, offset, count, bscale, bzero, o, nthreads, [](int32_t v) { return (int32_t)bswap32((uint32_t)v); });
            case 64: return decode<int64_t>(path, offset, count, bscale, bzero, o, nthreads, [](int64_t v) { return (int64_t)bswap64((uint64_t)v); });
            case 8: return decode<uint8_t>(path, offset, count, bscale, bzero, o, nthreads, [](uint8_t v) { return v; });
        }
    } else {
        float* o = static_cast<float*>(out);
        switch (bitpix) {
            case -32: return decode_f32(path, offset, count, bscale, bzero, o, nthreads);
            case -64: return decode_f64(path, offset, count, bscale, bzero, o, nthreads);
            case 16: return decode<int16_t>(path, offset, count, bscale, bzero, o, nthreads, [](int16_t v) { return (int16_t)bswap16((uint16_t)v); });
            case 32: return decode<int32_t>(path, offset, count, bscale, bzero, o, nthreads, [](int32_t v) { return (int32_t)bswap32((uint32_t)v); });
            case 64: return decode<int64_t>(path, offset, count, bscale, bzero, o, nthreads, [](int64_t v) { return (int64_t)bswap64((uint64_t)v); });
            case 8: return decode<uint8_t>(path, offset, count, bscale, bzero, o, nthreads, [](uint8_t v) { return v; });
        }
    }
    return -2;
}

// One-pass stats over a float32 buffer: npts (finite), min, max, sum, sumsq.
// Used for load-time statistics without a second pass over the data.
void fits_stats_f32(const float* data, size_t count, double* out5,
                    int nthreads) {
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    int maxt = std::max(1, nthreads);
    std::vector<double> acc(size_t(maxt) * 5);
    std::vector<std::thread> threads;
    size_t chunk = (count + maxt - 1) / maxt;
    for (int t = 0; t < maxt; ++t) {
        size_t lo = t * chunk, hi = std::min(count, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, t, lo, hi] {
            double n = 0, mn = 1e300, mx = -1e300, s = 0, ss = 0;
            for (size_t i = lo; i < hi; ++i) {
                float v = data[i];
                // FINITE only: +-inf must not poison sum/sumsq or count
                // into npts (the documented contract)
                if (v - v == 0.0f) {
                    n += 1;
                    if (v < mn) mn = v;
                    if (v > mx) mx = v;
                    s += v;
                    ss += double(v) * v;
                }
            }
            double* a = &acc[size_t(t) * 5];
            a[0] = n; a[1] = mn; a[2] = mx; a[3] = s; a[4] = ss;
        });
    }
    for (auto& th : threads) th.join();
    double n = 0, mn = 1e300, mx = -1e300, s = 0, ss = 0;
    for (int t = 0; t < maxt; ++t) {
        double* a = &acc[size_t(t) * 5];
        if (a[0] > 0) {
            n += a[0];
            mn = std::min(mn, a[1]);
            mx = std::max(mx, a[2]);
            s += a[3];
            ss += a[4];
        }
    }
    out5[0] = n; out5[1] = mn; out5[2] = mx; out5[3] = s; out5[4] = ss;
}

}  // extern "C"
