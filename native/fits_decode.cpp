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

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <limits>
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

// ------------------------------------------------------------------ RICE_1
//
// Batch tile codec for the FITS Tiled Image Compression convention
// (same bitstream as spectral_cube_tpu/io/tile_compress.py's Python
// implementation, which is byte-identical to CFITSIO fits_rcomp /
// fits_rdecomp; the Python module remains the fallback when no compiler
// is available).  Decoding is bit-serial per tile but tiles are
// independent, so the batch entry points parallelize across tiles —
// archive-scale compressed cubes decode at memory speed instead of the
// pure-Python bit loop's ~57k px/s.

namespace {

constexpr int kFsBits[5] = {0, 3, 4, 0, 5};   // bytepix -> selector width
constexpr int kFsMax[5] = {0, 6, 14, 0, 25};

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t acc = 0;   // low `n` bits are valid
    int n = 0;
    bool fail = false;

    BitReader(const uint8_t* buf, int64_t len) : p(buf), end(buf + len) {}

    inline int64_t read(int k) {            // k <= 32
        while (n < k) {
            if (p >= end) { fail = true; return -1; }
            acc = (acc << 8) | *p++;
            n += 8;
        }
        n -= k;
        int64_t v = (acc >> n) & ((k >= 64) ? ~0ull : ((1ull << k) - 1));
        acc &= (n >= 64) ? ~0ull : ((1ull << n) - 1);
        return v;
    }

    // count 0-bits up to and including the terminating 1-bit
    inline int64_t unary() {
        int64_t cnt = 0;
        for (;;) {
            if (n == 0) {
                if (p >= end) { fail = true; return -1; }
                acc = *p++;
                n = 8;
            }
            if (acc == 0) { cnt += n; n = 0; continue; }
            uint64_t win = acc << (64 - n);
            int lz = __builtin_clzll(win);
            cnt += lz;
            n -= lz + 1;
            acc &= (n >= 64) ? ~0ull : ((1ull << n) - 1);
            return cnt;
        }
    }
};

int rice_decode_one(const uint8_t* buf, int64_t clen, int32_t* out,
                    int64_t npix, int blocksize, int bytepix) {
    if (bytepix != 1 && bytepix != 2 && bytepix != 4) return 2;
    const int fsbits = kFsBits[bytepix];
    const int fsmax = kFsMax[bytepix];
    const int bbits = 8 * bytepix;
    const uint64_t mask = (bytepix == 4) ? 0xFFFFFFFFull
                                         : ((1ull << bbits) - 1);
    if (clen < bytepix) return 1;
    BitReader br(buf, clen);
    uint64_t lastpix = (uint64_t)br.read(bbits);
    int64_t i = 0;
    while (i < npix) {
        int64_t thisblock = std::min<int64_t>(blocksize, npix - i);
        int64_t fs = br.read(fsbits) - 1;
        if (br.fail) return 1;
        if (fs < 0) {
            for (int64_t j = 0; j < thisblock; ++j)
                out[i + j] = (int32_t)lastpix;
            i += thisblock;
        } else if (fs == fsmax) {
            for (int64_t j = 0; j < thisblock; ++j) {
                int64_t diff = br.read(bbits);
                if (br.fail) return 1;
                diff = (diff & 1) ? ~(diff >> 1) : (diff >> 1);
                lastpix = (uint64_t)(lastpix + diff) & mask;
                out[i + j] = (int32_t)lastpix;
            }
            i += thisblock;
        } else {
            for (int64_t j = 0; j < thisblock; ++j) {
                int64_t top = br.unary();
                if (br.fail) return 1;
                int64_t low = fs ? br.read((int)fs) : 0;
                if (br.fail) return 1;
                int64_t diff = (top << fs) | low;
                diff = (diff & 1) ? ~(diff >> 1) : (diff >> 1);
                lastpix = (uint64_t)(lastpix + diff) & mask;
                out[i + j] = (int32_t)lastpix;
            }
            i += thisblock;
        }
    }
    // reinterpret as signed bytepix-width values (bytepix 1 is unsigned)
    if (bytepix == 2) {
        for (int64_t k = 0; k < npix; ++k)
            out[k] = (int32_t)(int16_t)(uint16_t)out[k];
    } else if (bytepix == 1) {
        for (int64_t k = 0; k < npix; ++k)
            out[k] = (int32_t)(uint8_t)out[k];
    }
    return 0;
}

struct BitWriter {
    uint8_t* p;
    uint8_t* end;
    uint64_t acc = 0;
    int n = 0;
    bool fail = false;

    BitWriter(uint8_t* buf, int64_t cap) : p(buf), end(buf + cap) {}

    inline void write(uint64_t v, int k) {   // k <= 32
        acc = (acc << k) | (v & ((k >= 64) ? ~0ull : ((1ull << k) - 1)));
        n += k;
        while (n >= 8) {
            n -= 8;
            if (p >= end) { fail = true; n = 0; acc = 0; return; }
            *p++ = (uint8_t)((acc >> n) & 0xFF);
        }
        acc &= (1ull << n) - 1;
    }

    // `cnt` zero bits then a terminating 1
    inline void unary(int64_t cnt) {
        while (cnt >= 32) { write(0, 32); cnt -= 32; }
        write(1, (int)cnt + 1);
    }

    int64_t done(const uint8_t* base) {
        if (n) {
            if (p >= end) { fail = true; return -1; }
            *p++ = (uint8_t)((acc << (8 - n)) & 0xFF);
            n = 0;
        }
        return fail ? -1 : (int64_t)(p - base);
    }
};

int64_t rice_encode_one(const int32_t* vals, int64_t npix, int blocksize,
                        int bytepix, uint8_t* out, int64_t cap) {
    if (bytepix != 1 && bytepix != 2 && bytepix != 4 || npix <= 0) return -2;
    const int fsbits = kFsBits[bytepix];
    const int fsmax = kFsMax[bytepix];
    const int bbits = 8 * bytepix;
    const uint64_t mask = (bytepix == 4) ? 0xFFFFFFFFull
                                         : ((1ull << bbits) - 1);
    const int64_t half = 1ll << (bbits - 1);
    BitWriter w(out, cap);
    uint64_t first = (uint64_t)vals[0] & mask;
    w.write(first, bbits);
    uint64_t lastpix = first;
    std::vector<uint64_t> diffs((size_t)std::min<int64_t>(npix, blocksize));
    int64_t i = 0;
    while (i < npix) {
        int64_t thisblock = std::min<int64_t>(blocksize, npix - i);
        double pixelsum = 0.0;
        for (int64_t j = 0; j < thisblock; ++j) {
            uint64_t v = (uint64_t)vals[i + j] & mask;
            int64_t d = (int64_t)((v - lastpix) & mask);
            if (d >= half) d -= (int64_t)mask + 1;   // shortest signed rep
            uint64_t zz = (d < 0) ? (uint64_t)(~(d << 1)) : (uint64_t)(d << 1);
            zz &= (bytepix == 4) ? ~0ull : ((1ull << (bbits + 1)) - 1);
            diffs[(size_t)j] = zz;
            pixelsum += (double)zz;
            lastpix = v;
        }
        if (pixelsum == 0.0) {
            w.write(0, fsbits);
            i += thisblock;
            continue;
        }
        double dpsum = (pixelsum - (double)thisblock / 2.0 - 1.0)
                       / (double)thisblock;
        if (dpsum < 0) dpsum = 0.0;
        uint64_t psum = ((uint64_t)dpsum) >> 1;
        int fs = 0;
        while (psum > 0) { psum >>= 1; ++fs; }
        if (fs >= fsmax) {
            w.write((uint64_t)fsmax + 1, fsbits);
            for (int64_t j = 0; j < thisblock; ++j)
                w.write(diffs[(size_t)j], bbits);
        } else {
            w.write((uint64_t)fs + 1, fsbits);
            for (int64_t j = 0; j < thisblock; ++j) {
                uint64_t v = diffs[(size_t)j];
                w.unary((int64_t)(v >> fs));
                if (fs) w.write(v, fs);
            }
        }
        if (w.fail) return -1;
        i += thisblock;
    }
    return w.done(out);
}

// ---- subtractive-dither machinery (FITS tiled-compression convention)
//
// The convention's Park-Miller generator: 10000 float32 values from
// seed -> 16807*seed mod (2^31-1); a tile's dither walk starts at
// int(rand[(tile_row + ZDITHER0 - 2) % 10000] * 500) and advances one
// slot per pixel, re-seeding from the next table slot on wraparound.

constexpr int kNRandom = 10000;
constexpr int32_t kNullValue = -2147483647;   // quantized NaN
constexpr int32_t kZeroValue = -2147483646;   // exact 0.0 (DITHER_2)

const float* dither_table() {
    static std::vector<float> table = [] {
        std::vector<float> t(kNRandom);
        int64_t seed = 1;
        for (int i = 0; i < kNRandom; ++i) {
            seed = (16807 * seed) % 2147483647ll;
            t[i] = (float)((double)seed / 2147483647.0);
        }
        return t;
    }();
    return table.data();
}

struct DitherWalk {
    const float* rand = dither_table();
    int iseed, nextrand;
    DitherWalk(int64_t row1, int zdither0) {
        iseed = (int)((row1 + zdither0 - 2) % kNRandom);
        if (iseed < 0) iseed += kNRandom;
        nextrand = (int)(rand[iseed] * 500.0);
    }
    inline float next() {
        float v = rand[nextrand];
        if (++nextrand == kNRandom) {
            iseed = (iseed + 1) % kNRandom;
            nextrand = (int)(rand[iseed] * 500.0);
        }
        return v;
    }
};

// unquantize one decoded int32 tile into float32/float64 output
template <typename Out>
void unquantize_tile(const int32_t* ints, int64_t npix, double scale,
                     double zero, int dither_method, int64_t row1,
                     int zdither0, int64_t zblank, int has_zblank,
                     Out* out) {
    const int32_t nullv = has_zblank ? (int32_t)zblank : kNullValue;
    const Out qnan = std::numeric_limits<Out>::quiet_NaN();
    if (dither_method > 0) {
        DitherWalk dw(row1, zdither0);
        for (int64_t i = 0; i < npix; ++i) {
            int32_t v = ints[i];
            float d = dw.next();                  // advances every pixel
            if (v == nullv) out[i] = qnan;
            else if (dither_method == 2 && v == kZeroValue) out[i] = Out(0);
            else out[i] = (Out)(((double)v - (double)d + 0.5) * scale
                                + zero);
        }
    } else {
        for (int64_t i = 0; i < npix; ++i) {
            int32_t v = ints[i];
            out[i] = (v == nullv) ? qnan
                                  : (Out)((double)v * scale + zero);
        }
    }
}

// robust noise: 1.482602/sqrt(6) * median(|2*v1 - v0 - v2|) over finite
// triples (the convention's recommended ZSCALE statistic)
double tile_noise3(const float* v, int64_t npix,
                   std::vector<double>& scratch) {
    scratch.clear();
    for (int64_t i = 1; i + 1 < npix; ++i) {
        double d = 2.0 * (double)v[i] - (double)v[i - 1]
                   - (double)v[i + 1];
        if (d - d == 0.0) scratch.push_back(std::abs(d));
    }
    if (scratch.size() < 2) return 0.0;
    size_t mid = scratch.size() / 2;
    std::nth_element(scratch.begin(), scratch.begin() + mid,
                     scratch.end());
    double med = scratch[mid];
    if (scratch.size() % 2 == 0) {
        double lo = *std::max_element(scratch.begin(),
                                      scratch.begin() + mid);
        med = 0.5 * (med + lo);
    }
    return 1.482602 / std::sqrt(6.0) * med;
}

// quantize one float32 tile to int32; returns 0 ok, 1 = range too wide
// (caller stores the tile losslessly instead)
int quantize_tile(const float* v, int64_t npix, double qlevel,
                  int dither_method, int64_t row1, int zdither0,
                  std::vector<double>& scratch, int32_t* ints,
                  double* zscale, double* zzero, int* any_null) {
    double vmin = 0, vmax = 0;
    int64_t nfin = 0;
    for (int64_t i = 0; i < npix; ++i) {
        float x = v[i];
        if (x - x == 0.0f) {
            if (!nfin) { vmin = vmax = x; }
            else { vmin = std::min(vmin, (double)x);
                   vmax = std::max(vmax, (double)x); }
            ++nfin;
        } else {
            *any_null = 1;
        }
    }
    if (nfin == 0) {
        for (int64_t i = 0; i < npix; ++i) ints[i] = kNullValue;
        *zscale = 1.0; *zzero = 0.0;
        return 0;
    }
    double delta;
    if (qlevel < 0) {
        delta = -qlevel;
    } else {
        double noise = tile_noise3(v, npix, scratch);
        if (noise == 0.0) {
            double span = vmax - vmin;
            delta = span > 0 ? span / 16777216.0 : 1.0;
        } else {
            delta = noise / qlevel;
        }
    }
    double steps = (vmax - vmin) / delta;
    if (!(steps == steps) || steps > 2147483632.0) return 1;
    *zscale = delta;
    *zzero = vmin;
    if (dither_method > 0) {
        DitherWalk dw(row1, zdither0);
        for (int64_t i = 0; i < npix; ++i) {
            float x = v[i];
            float d = dw.next();
            if (x - x != 0.0f) { ints[i] = kNullValue; continue; }
            if (dither_method == 2 && x == 0.0f) {
                ints[i] = kZeroValue;
                continue;
            }
            double q = ((double)x - vmin) / delta + (double)d - 0.5;
            ints[i] = (int32_t)(q >= 0 ? (q + 0.5) : (q - 0.5));
        }
    } else {
        for (int64_t i = 0; i < npix; ++i) {
            float x = v[i];
            if (x - x != 0.0f) { ints[i] = kNullValue; continue; }
            double q = ((double)x - vmin) / delta;
            ints[i] = (int32_t)(q >= 0 ? (q + 0.5) : (q - 0.5));
        }
    }
    return 0;
}

}  // namespace

extern "C" {

// Decode `ntiles` RICE_1 tiles from `heap` into int32 `out` (tile t's
// bytes at offs[t]..offs[t]+lens[t], decoded values written at element
// out_off[t]).  Returns 0, or 1+t for the first failing tile.
int rice_decode_tiles(const uint8_t* heap, int64_t heap_len,
                      const int64_t* offs, const int64_t* lens,
                      const int64_t* npix, const int64_t* out_off,
                      int64_t ntiles, int blocksize, int bytepix,
                      int32_t* out, int nthreads) {
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    std::vector<int64_t> bad((size_t)std::max(1, nthreads), 0);
    int maxt = std::max(1, nthreads);
    std::vector<std::thread> threads;
    int64_t chunk = (ntiles + maxt - 1) / maxt;
    for (int t = 0; t < maxt; ++t) {
        int64_t lo = t * chunk, hi = std::min(ntiles, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, t, lo, hi] {
            for (int64_t k = lo; k < hi; ++k) {
                if (offs[k] < 0 || lens[k] < 0 ||
                    offs[k] + lens[k] > heap_len ||
                    rice_decode_one(heap + offs[k], lens[k],
                                    out + out_off[k], npix[k],
                                    blocksize, bytepix) != 0) {
                    if (!bad[(size_t)t]) bad[(size_t)t] = k + 1;
                    return;
                }
            }
        });
    }
    for (auto& th : threads) th.join();
    for (auto b : bad) if (b) return (int)b;
    return 0;
}

// Fused decode + unquantize: RICE-decode each tile and apply the
// per-tile ZSCALE/ZZERO (+ optional subtractive dither reversal and
// ZBLANK -> NaN) straight into the float32/float64 image buffer.
// Returns 0, or 1+t for the first failing tile.
int rice_decode_unquantize_tiles(
        const uint8_t* heap, int64_t heap_len, const int64_t* offs,
        const int64_t* lens, const int64_t* npix, const int64_t* out_off,
        const int64_t* rows1, int64_t ntiles, int blocksize, int bytepix,
        const double* zscale, const double* zzero, int dither_method,
        int zdither0, const int64_t* zblank, int has_zblank, void* out,
        int out_double, int nthreads) {
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    int maxt = std::max(1, nthreads);
    std::vector<int64_t> bad((size_t)maxt, 0);
    std::vector<std::thread> threads;
    int64_t chunk = (ntiles + maxt - 1) / maxt;
    for (int t = 0; t < maxt; ++t) {
        int64_t lo = t * chunk, hi = std::min(ntiles, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, t, lo, hi] {
            std::vector<int32_t> ibuf;
            for (int64_t k = lo; k < hi; ++k) {
                if (offs[k] < 0 || lens[k] < 0 ||
                    offs[k] + lens[k] > heap_len) {
                    if (!bad[(size_t)t]) bad[(size_t)t] = k + 1;
                    return;
                }
                ibuf.resize((size_t)npix[k]);
                if (rice_decode_one(heap + offs[k], lens[k], ibuf.data(),
                                    npix[k], blocksize, bytepix) != 0) {
                    if (!bad[(size_t)t]) bad[(size_t)t] = k + 1;
                    return;
                }
                double sc = zscale ? zscale[k] : 1.0;
                double zr = zzero ? zzero[k] : 0.0;
                int64_t zb = zblank ? zblank[k] : 0;
                int64_t r1 = rows1 ? rows1[k] : k + 1;
                if (out_double)
                    unquantize_tile(ibuf.data(), npix[k], sc, zr,
                                    dither_method, r1, zdither0, zb,
                                    has_zblank,
                                    (double*)out + out_off[k]);
                else
                    unquantize_tile(ibuf.data(), npix[k], sc, zr,
                                    dither_method, r1, zdither0, zb,
                                    has_zblank,
                                    (float*)out + out_off[k]);
            }
        });
    }
    for (auto& th : threads) th.join();
    for (auto b : bad) if (b) return (int)b;
    return 0;
}

// Fused quantize + encode: quantize each float32 tile (CFITSIO qlevel
// semantics: > 0 relative to tile noise, < 0 absolute delta) with
// optional subtractive dithering, then RICE-encode.  out_lens[t] gets
// the encoded length, -1 when the tile did not fit the capacity, or -2
// when its dynamic range cannot quantize (caller stores it losslessly).
// zscale/zzero[t] receive the per-tile quantization; *any_null is set
// when NaNs were seen.  Returns 0.
int rice_quantize_encode_tiles(
        const float* data, const int64_t* npix, const int64_t* in_off,
        int64_t ntiles, int blocksize, double qlevel, int dither_method,
        int zdither0, uint8_t* out, const int64_t* cap_off,
        int64_t* out_lens, double* zscale, double* zzero, int* any_null,
        int nthreads) {
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    int maxt = std::max(1, nthreads);
    std::vector<int> nulls((size_t)maxt, 0);
    std::vector<std::thread> threads;
    int64_t chunk = (ntiles + maxt - 1) / maxt;
    for (int t = 0; t < maxt; ++t) {
        int64_t lo = t * chunk, hi = std::min(ntiles, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, t, lo, hi] {
            std::vector<int32_t> ibuf;
            std::vector<double> scratch;
            for (int64_t k = lo; k < hi; ++k) {
                ibuf.resize((size_t)npix[k]);
                int rc = quantize_tile(data + in_off[k], npix[k], qlevel,
                                       dither_method, k + 1, zdither0,
                                       scratch, ibuf.data(), &zscale[k],
                                       &zzero[k], &nulls[(size_t)t]);
                if (rc != 0) { out_lens[k] = -2; continue; }
                out_lens[k] = rice_encode_one(
                    ibuf.data(), npix[k], blocksize, 4, out + cap_off[k],
                    cap_off[k + 1] - cap_off[k]);
            }
        });
    }
    for (auto& th : threads) th.join();
    for (auto nl : nulls) if (nl) { *any_null = 1; break; }
    return 0;
}

// Encode `ntiles` tiles of int32 pixels (tile t reads npix[t] values at
// in_off[t], writes its bitstream at out + cap_off[t] with capacity
// cap_off[t+1]-cap_off[t]).  out_lens[t] receives the encoded length, or
// -1 when the tile did not fit (caller re-encodes those via the Python
// fallback).  Returns 0 always (per-tile status is in out_lens).
int rice_encode_tiles(const int32_t* vals, const int64_t* npix,
                      const int64_t* in_off, int64_t ntiles,
                      int blocksize, int bytepix, uint8_t* out,
                      const int64_t* cap_off, int64_t* out_lens,
                      int nthreads) {
    if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
    int maxt = std::max(1, nthreads);
    std::vector<std::thread> threads;
    int64_t chunk = (ntiles + maxt - 1) / maxt;
    for (int t = 0; t < maxt; ++t) {
        int64_t lo = t * chunk, hi = std::min(ntiles, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, lo, hi] {
            for (int64_t k = lo; k < hi; ++k)
                out_lens[k] = rice_encode_one(
                    vals + in_off[k], npix[k], blocksize, bytepix,
                    out + cap_off[k], cap_off[k + 1] - cap_off[k]);
        });
    }
    for (auto& th : threads) th.join();
    return 0;
}

}  // extern "C"
