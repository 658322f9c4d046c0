/*
 * Native host-runtime support for popsift_tpu.
 *
 * The reference implements its host pipeline in C++ (image staging,
 * PGM/PPM decoding, RGB->grey conversion; /root/reference/src/application/
 * pgmread.cpp, src/popsift/s_image.cu).  The TPU rebuild keeps the device
 * path in XLA but implements the host-side hot loops natively:
 *
 *   - read_pgm(path): P2/P3/P5/P6 PNM decode with the OpenCV integer
 *     grey coefficients (4899*R + 9617*G + 1868*B) >> 14
 *     (pgmread.cpp:33-47), multi-threaded for large images
 *   - normalize_u8(array): uint8 -> float32 / 255 staging conversion
 *     (the analog of the CUDA normalized-float texture read,
 *     s_image.cu:147), multi-threaded
 *   - rgb_to_grey(array): standalone conversion helper
 *
 * Built as a CPython extension (no pybind11 dependency).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kRateR = 4899;
constexpr int kRateG = 9617;
constexpr int kRateB = 1868;
constexpr int kRateShift = 14;

int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n == 0 ? 1 : static_cast<int>(n);
}

void parallel_for(int64_t n, int64_t grain,
                  const std::function<void(int64_t, int64_t)>& body) {
    int nt = hw_threads();
    if (n < grain * 2 || nt <= 1) {
        body(0, n);
        return;
    }
    if (nt > 8) nt = 8;
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        ts.emplace_back(body, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------
// PNM parsing
// ---------------------------------------------------------------------

struct PnmHeader {
    int magic = 0;     // 2, 3, 5 or 6
    int width = 0;
    int height = 0;
    int maxval = 0;
    size_t data_pos = 0;
};

bool skip_space_and_comments(const std::string& buf, size_t& pos) {
    const size_t n = buf.size();
    for (;;) {
        while (pos < n && isspace(static_cast<unsigned char>(buf[pos])))
            ++pos;
        if (pos < n && buf[pos] == '#') {
            while (pos < n && buf[pos] != '\n') ++pos;
            continue;
        }
        return pos < n;
    }
}

bool read_int(const std::string& buf, size_t& pos, int* out) {
    if (!skip_space_and_comments(buf, pos)) return false;
    int v = 0;
    bool any = false;
    const size_t n = buf.size();
    while (pos < n && isdigit(static_cast<unsigned char>(buf[pos]))) {
        v = v * 10 + (buf[pos] - '0');
        ++pos;
        any = true;
    }
    *out = v;
    return any;
}

bool parse_header(const std::string& buf, PnmHeader* hdr) {
    if (buf.size() < 2 || buf[0] != 'P') return false;
    hdr->magic = buf[1] - '0';
    if (hdr->magic != 2 && hdr->magic != 3 && hdr->magic != 5 &&
        hdr->magic != 6)
        return false;
    size_t pos = 2;
    if (!read_int(buf, pos, &hdr->width)) return false;
    if (!read_int(buf, pos, &hdr->height)) return false;
    if (!read_int(buf, pos, &hdr->maxval)) return false;
    if (hdr->width <= 0 || hdr->height <= 0 || hdr->maxval <= 0 ||
        hdr->maxval > 65535)
        return false;
    // single whitespace byte after maxval in binary formats
    hdr->data_pos = pos + 1;
    return true;
}

inline uint8_t grey_from_rgb(int r, int g, int b) {
    return static_cast<uint8_t>(
        (kRateR * r + kRateG * g + kRateB * b) >> kRateShift);
}

PyObject* py_read_pgm(PyObject*, PyObject* args) {
    const char* path = nullptr;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

    std::string buf;
    {
        FILE* f = std::fopen(path, "rb");
        if (!f) {
            PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
            return nullptr;
        }
        std::fseek(f, 0, SEEK_END);
        long sz = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        buf.resize(static_cast<size_t>(sz));
        size_t got = std::fread(buf.data(), 1, buf.size(), f);
        std::fclose(f);
        buf.resize(got);
    }

    PnmHeader hdr;
    if (!parse_header(buf, &hdr)) {
        PyErr_Format(PyExc_ValueError, "%s: not a supported PNM file", path);
        return nullptr;
    }

    const int w = hdr.width, h = hdr.height;
    const int channels = (hdr.magic == 3 || hdr.magic == 6) ? 3 : 1;
    const int64_t count = static_cast<int64_t>(w) * h * channels;

    npy_intp dims[2] = {h, w};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(2, dims, NPY_UINT8));
    if (!out) return nullptr;
    uint8_t* dst = static_cast<uint8_t*>(PyArray_DATA(out));

    bool ok = true;
    if (hdr.magic == 5 || hdr.magic == 6) {
        const size_t bpe = hdr.maxval < 256 ? 1 : 2;
        if (buf.size() < hdr.data_pos + count * bpe) {
            ok = false;
        } else {
            const uint8_t* src = reinterpret_cast<const uint8_t*>(
                buf.data() + hdr.data_pos);
            Py_BEGIN_ALLOW_THREADS
            if (channels == 1 && bpe == 1) {
                std::memcpy(dst, src, count);
            } else {
                parallel_for(h, 64, [&](int64_t lo, int64_t hi) {
                    for (int64_t y = lo; y < hi; ++y) {
                        for (int x = 0; x < w; ++x) {
                            int64_t i = (y * w + x) * channels;
                            int r, g, b;
                            if (bpe == 1) {
                                r = src[i];
                                g = channels == 3 ? src[i + 1] : r;
                                b = channels == 3 ? src[i + 2] : r;
                            } else {
                                r = src[2 * i];
                                g = channels == 3 ? src[2 * (i + 1)] : r;
                                b = channels == 3 ? src[2 * (i + 2)] : r;
                            }
                            dst[y * w + x] = channels == 3
                                ? grey_from_rgb(r, g, b)
                                : static_cast<uint8_t>(r);
                        }
                    }
                });
            }
            Py_END_ALLOW_THREADS
        }
    } else {
        // ASCII variants
        size_t pos = hdr.data_pos - 1;
        for (int64_t i = 0; i < count && ok; i += channels) {
            int r = 0, g = 0, b = 0;
            ok = read_int(buf, pos, &r);
            if (channels == 3 && ok) {
                ok = read_int(buf, pos, &g) && read_int(buf, pos, &b);
            }
            if (!ok) break;
            if (hdr.maxval >= 256) {
                r >>= 8; g >>= 8; b >>= 8;
            }
            dst[i / channels] = channels == 3
                ? grey_from_rgb(r, g, b) : static_cast<uint8_t>(r);
        }
    }

    if (!ok) {
        Py_DECREF(out);
        PyErr_Format(PyExc_ValueError, "%s: truncated PNM data", path);
        return nullptr;
    }
    return reinterpret_cast<PyObject*>(out);
}

PyObject* py_normalize_u8(PyObject*, PyObject* args) {
    PyObject* in = nullptr;
    if (!PyArg_ParseTuple(args, "O", &in)) return nullptr;
    PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(in, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS));
    if (!arr) return nullptr;

    int nd = PyArray_NDIM(arr);
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(nd, PyArray_DIMS(arr), NPY_FLOAT32));
    if (!out) {
        Py_DECREF(arr);
        return nullptr;
    }
    const uint8_t* src = static_cast<uint8_t*>(PyArray_DATA(arr));
    float* dst = static_cast<float*>(PyArray_DATA(out));
    const int64_t n = PyArray_SIZE(arr);

    Py_BEGIN_ALLOW_THREADS
    static float lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        for (int i = 0; i < 256; ++i) lut[i] = static_cast<float>(i) / 255.0f;
        lut_init = true;
    }
    parallel_for(n, 1 << 16, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) dst[i] = lut[src[i]];
    });
    Py_END_ALLOW_THREADS

    Py_DECREF(arr);
    return reinterpret_cast<PyObject*>(out);
}

PyObject* py_rgb_to_grey(PyObject*, PyObject* args) {
    PyObject* in = nullptr;
    if (!PyArg_ParseTuple(args, "O", &in)) return nullptr;
    PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(in, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS));
    if (!arr) return nullptr;
    if (PyArray_NDIM(arr) != 3 || PyArray_DIM(arr, 2) != 3) {
        Py_DECREF(arr);
        PyErr_SetString(PyExc_ValueError, "expected (H, W, 3) uint8 array");
        return nullptr;
    }
    npy_intp dims[2] = {PyArray_DIM(arr, 0), PyArray_DIM(arr, 1)};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(2, dims, NPY_UINT8));
    if (!out) {
        Py_DECREF(arr);
        return nullptr;
    }
    const uint8_t* src = static_cast<uint8_t*>(PyArray_DATA(arr));
    uint8_t* dst = static_cast<uint8_t*>(PyArray_DATA(out));
    const int64_t n = dims[0] * dims[1];

    Py_BEGIN_ALLOW_THREADS
    parallel_for(n, 1 << 15, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            dst[i] = grey_from_rgb(src[3 * i], src[3 * i + 1],
                                   src[3 * i + 2]);
        }
    });
    Py_END_ALLOW_THREADS

    Py_DECREF(arr);
    return reinterpret_cast<PyObject*>(out);
}

// ---------------------------------------------------------------------
// E2v2 wire-codec encoder (popsift_tpu/wirecodec.py is the format spec;
// the XLA decoder lives there).  Second-difference residuals, 2-bit or
// 4-bit code stream + escape bytes behind a 16-byte header; returns
// None when neither code width would beat raw.
// ---------------------------------------------------------------------

constexpr uint32_t kE2Magic = 0x50C0DEC2u;
constexpr int kE2HeaderBytes = 16;
constexpr uint8_t kE4Esc = 15;

// Content digest over the residual plane (bijective with the image given
// its dims), used to key the pipeline's upload LRU.  Hardware CRC32C per
// 8-byte word, folded into a 64-bit FNV-1a chain per chunk; chunk hashes
// are combined in chunk order so the result is thread-schedule-invariant.
#if defined(__x86_64__)
__attribute__((target("sse4.2")))
uint64_t crc_chunk(const uint8_t* p, int64_t n) {
    uint64_t h = 1469598103934665603ull;
    int64_t i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t v;
        std::memcpy(&v, p + i, 8);
        h = (h ^ __builtin_ia32_crc32di(h, v)) * 1099511628211ull;
    }
    for (; i < n; ++i) {
        h = (h ^ p[i]) * 1099511628211ull;
    }
    return h;
}
#else
uint64_t crc_chunk(const uint8_t* p, int64_t n) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t i = 0; i < n; ++i) h = (h ^ p[i]) * 1099511628211ull;
    return h;
}
#endif

PyObject* py_encode_e2v2(PyObject*, PyObject* args) {
    PyObject* in = nullptr;
    long bucket = 128 * 1024;
    int want_digest = 0;
    if (!PyArg_ParseTuple(args, "O|li", &in, &bucket, &want_digest)) {
        return nullptr;
    }
    PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(in, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS));
    if (!arr) return nullptr;
    if (PyArray_NDIM(arr) != 2) {
        Py_DECREF(arr);
        PyErr_SetString(PyExc_ValueError, "expected (H, W) uint8 array");
        return nullptr;
    }
    const int64_t h = PyArray_DIM(arr, 0), w = PyArray_DIM(arr, 1);
    const int64_t total = h * w;
    const uint8_t* src = static_cast<uint8_t*>(PyArray_DATA(arr));

    std::vector<uint8_t> res(static_cast<size_t>(total));
    const int nchunks = 16;
    const int64_t rows_per = (h + nchunks - 1) / nchunks;
    int64_t esc2_count[nchunks];
    int64_t esc4_count[nchunks];
    int64_t nz_count[nchunks];
    std::memset(esc2_count, 0, sizeof(esc2_count));
    std::memset(esc4_count, 0, sizeof(esc4_count));
    std::memset(nz_count, 0, sizeof(nz_count));

    uint64_t chunk_hash[nchunks];
    std::memset(chunk_hash, 0, sizeof(chunk_hash));

    Py_BEGIN_ALLOW_THREADS
    // pass 1: mod-256 second-difference residuals + per-chunk escape /
    // nonzero counts for all schemes (rows are independent given src).
    // The residual loop is kept branch-free over x >= 1 and split from
    // the counting loop so both autovectorize on the 1-core hosts this
    // runs on (the fused branchy form measured ~4x slower).
    parallel_for(nchunks, 1, [&](int64_t clo, int64_t chi) {
        for (int64_t c = clo; c < chi; ++c) {
            int64_t y0 = c * rows_per, y1 = y0 + rows_per;
            if (y1 > h) y1 = h;
            for (int64_t y = y0; y < y1; ++y) {
                const uint8_t* __restrict row = src + y * w;
                const uint8_t* __restrict up =
                    y ? src + (y - 1) * w : nullptr;
                uint8_t* __restrict rrow = res.data() + y * w;
                if (up) {
                    rrow[0] = static_cast<uint8_t>(row[0] - up[0]);
                    for (int64_t x = 1; x < w; ++x) {
                        rrow[x] = static_cast<uint8_t>(
                            row[x] - row[x - 1] - up[x] + up[x - 1]);
                    }
                } else {
                    rrow[0] = row[0];
                    for (int64_t x = 1; x < w; ++x) {
                        rrow[x] = static_cast<uint8_t>(
                            row[x] - row[x - 1]);
                    }
                }
            }
            int64_t e2 = 0, e4 = 0, nzc = 0;
            const uint8_t* __restrict r = res.data() + y0 * w;
            const int64_t n = (y1 - y0) * w;
            for (int64_t i = 0; i < n; ++i) {
                uint8_t d = r[i];
                // d not in {0, 1, 255}  <=>  (uint8)(d + 1) > 2
                e2 += static_cast<uint8_t>(d + 1) > 2;
                nzc += d != 0;
                int8_t sd = static_cast<int8_t>(d);
                uint8_t z = static_cast<uint8_t>((sd << 1) ^ (sd >> 7));
                e4 += z >= kE4Esc;
            }
            esc2_count[c] = e2;
            esc4_count[c] = e4;
            nz_count[c] = nzc;
            if (want_digest) chunk_hash[c] = crc_chunk(r, n);
        }
    });
    Py_END_ALLOW_THREADS

    PyObject* digest = nullptr;
    if (want_digest) {
        uint64_t hh[2] = {1469598103934665603ull, 14695981039346656037ull};
        for (int c = 0; c < nchunks; ++c) {
            hh[0] = (hh[0] ^ chunk_hash[c]) * 1099511628211ull;
            hh[1] = (hh[1] ^ (chunk_hash[c] + 0x9e3779b97f4a7c15ull))
                * 1099511628211ull;
        }
        hh[0] ^= static_cast<uint64_t>(h) << 32 ^ static_cast<uint64_t>(w);
        digest = PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(hh), 16);
        if (!digest) {
            Py_DECREF(arr);
            return nullptr;
        }
    }

    int64_t n_esc2 = 0, n_esc4 = 0, n_nz = 0;
    for (int c = 0; c < nchunks; ++c) {
        n_esc2 += esc2_count[c];
        n_esc4 += esc4_count[c];
        n_nz += nz_count[c];
    }
    const int64_t nz1 = n_nz > 0 ? n_nz : 1;
    const int64_t pay2 = kE2HeaderBytes + (total + 3) / 4 + n_esc2;
    const int64_t pay4 = kE2HeaderBytes + (total + 1) / 2 + n_esc4;
    const int64_t pay3 = kE2HeaderBytes + (total + 7) / 8
        + (nz1 + 3) / 4 + n_esc2;
    if (pay2 >= total && pay4 >= total && pay3 >= total) {
        Py_DECREF(arr);
        if (digest) {
            PyObject* t = PyTuple_Pack(2, Py_None, digest);
            Py_DECREF(digest);
            return t;
        }
        Py_RETURN_NONE;
    }
    // scheme ids match wirecodec.py: 1 = bitmap+2bit, 2 = 2-bit, 4 = 4-bit
    const int bits = (pay3 <= pay2 && pay3 <= pay4) ? 1
                     : (pay2 <= pay4 ? 2 : 4);
    const int64_t n_esc = bits == 4 ? n_esc4 : n_esc2;
    const int64_t* esc_count = bits == 4 ? esc4_count : esc2_count;
    int64_t esc_off[nchunks];
    int64_t nz_off[nchunks];
    {
        int64_t acc = 0, nacc = 0;
        for (int c = 0; c < nchunks; ++c) {
            esc_off[c] = acc;
            acc += esc_count[c];
            nz_off[c] = nacc;
            nacc += nz_count[c];
        }
    }
    const int64_t bm_len = (total + 7) / 8;
    const int64_t slen = bits == 1 ? bm_len + (nz1 + 3) / 4
                         : (total + (8 / bits) - 1) / (8 / bits);
    const int64_t payload = kE2HeaderBytes + slen + n_esc;
    const int64_t out_len = (payload + bucket - 1) / bucket * bucket;

    npy_intp dims[1] = {out_len};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_ZEROS(1, dims, NPY_UINT8, 0));
    if (!out) {
        Py_DECREF(arr);
        Py_XDECREF(digest);
        return nullptr;
    }
    uint8_t* dst = static_cast<uint8_t*>(PyArray_DATA(out));

    Py_BEGIN_ALLOW_THREADS
    uint32_t header[4] = {kE2Magic, static_cast<uint32_t>(n_esc),
                          static_cast<uint32_t>(bits), 0};
    std::memcpy(dst, header, kE2HeaderBytes);
    uint8_t* stream = dst + kE2HeaderBytes;
    uint8_t* ebase = stream + slen;
    // pass 2a: pack codes over the flat index space (code groups can
    // straddle row-chunk boundaries, so chunking is over output bytes)
    if (bits == 1) {
        // E2v3: nonzero bitmap (LSB-first), then 2-bit codes for the
        // nonzeros in flat order.  Pixel-chunk boundaries straddle both
        // bitmap bytes and code bytes, so first compact the nonzero
        // codes per row-chunk (independent via nz_off), then pack the
        // two fixed-size streams byte-parallel.
        // +1 slack: the branchless compaction stores one byte past the
        // last accepted slot when trailing residuals are zero
        std::vector<uint8_t> cvals(static_cast<size_t>(nz1) + 1, 0);
        parallel_for(nchunks, 1, [&](int64_t clo, int64_t chi) {
            for (int64_t c = clo; c < chi; ++c) {
                int64_t y0 = c * rows_per, y1 = y0 + rows_per;
                if (y1 > h) y1 = h;
                uint8_t* cv = cvals.data() + nz_off[c];
                const uint8_t* r = res.data() + y0 * w;
                const uint8_t* rend = res.data() + y1 * w;
                // branchless compaction: unconditional store + masked
                // advance (a data-dependent branch here mispredicts on
                // ~20%-nonzero natural content and costs more than all
                // the arithmetic passes combined)
                for (; r < rend; ++r) {
                    uint8_t d = *r;
                    *cv = d == 1 ? 1 : d == 255 ? 2 : 3;
                    cv += d != 0;
                }
            }
        });
        parallel_for(bm_len, 1 << 15, [&](int64_t lo, int64_t hi) {
            const int64_t full = total / 8;
            const int64_t fhi = hi < full ? hi : full;
            for (int64_t i = lo; i < fhi; ++i) {
                const uint8_t* __restrict p = res.data() + 8 * i;
                uint8_t b = 0;
                for (int k = 0; k < 8; ++k) {
                    b |= static_cast<uint8_t>((p[k] != 0) << k);
                }
                stream[i] = b;
            }
            for (int64_t i = fhi < lo ? lo : fhi; i < hi; ++i) {
                uint8_t b = 0;
                for (int k = 0; k < 8; ++k) {
                    int64_t p = 8 * i + k;
                    if (p < total && res[p] != 0) {
                        b |= static_cast<uint8_t>(1u << k);
                    }
                }
                stream[i] = b;
            }
        });
        uint8_t* cstream = stream + bm_len;
        const int64_t cs_len = (nz1 + 3) / 4;
        parallel_for(cs_len, 1 << 15, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t b = 0;
                for (int k = 0; k < 4; ++k) {
                    int64_t p = 4 * i + k;
                    if (p < n_nz) {
                        b |= static_cast<uint8_t>(cvals[p] << (2 * k));
                    }
                }
                cstream[i] = b;
            }
        });
    } else if (bits == 2) {
        parallel_for(slen, 1 << 15, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t b = 0;
                for (int k = 0; k < 4; ++k) {
                    int64_t p = 4 * i + k;
                    uint8_t code = 0;
                    if (p < total) {
                        uint8_t d = res[p];
                        code = d == 0 ? 0 : d == 1 ? 1 : d == 255 ? 2 : 3;
                    }
                    b |= static_cast<uint8_t>(code << (2 * k));
                }
                stream[i] = b;
            }
        });
    } else {
        parallel_for(slen, 1 << 15, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t nibs[2] = {0, 0};
                for (int k = 0; k < 2; ++k) {
                    int64_t p = 2 * i + k;
                    if (p < total) {
                        int8_t sd = static_cast<int8_t>(res[p]);
                        uint8_t z = static_cast<uint8_t>(
                            (sd << 1) ^ (sd >> 7));
                        nibs[k] = z >= kE4Esc ? kE4Esc : z;
                    }
                }
                stream[i] = static_cast<uint8_t>(nibs[0] | (nibs[1] << 4));
            }
        });
    }
    // pass 2b: escape bytes, per row-chunk with precomputed offsets
    parallel_for(nchunks, 1, [&](int64_t clo, int64_t chi) {
        for (int64_t c = clo; c < chi; ++c) {
            int64_t y0 = c * rows_per, y1 = y0 + rows_per;
            if (y1 > h) y1 = h;
            uint8_t* e = ebase + esc_off[c];
            const uint8_t* r = res.data() + y0 * w;
            const uint8_t* rend = res.data() + y1 * w;
            if (bits != 4) {  // schemes 1 and 2 share the escape set
                // escapes are rare (~2%) so the branch predicts well
                for (; r < rend; ++r) {
                    if (static_cast<uint8_t>(*r + 1) > 2) *e++ = *r;
                }
            } else {
                for (; r < rend; ++r) {
                    int8_t sd = static_cast<int8_t>(*r);
                    uint8_t z = static_cast<uint8_t>((sd << 1) ^ (sd >> 7));
                    if (z >= kE4Esc) *e++ = *r;
                }
            }
        }
    });
    Py_END_ALLOW_THREADS

    Py_DECREF(arr);
    if (digest) {
        PyObject* t = PyTuple_Pack(
            2, reinterpret_cast<PyObject*>(out), digest);
        Py_DECREF(out);
        Py_DECREF(digest);
        return t;
    }
    return reinterpret_cast<PyObject*>(out);
}

PyMethodDef kMethods[] = {
    {"read_pgm", py_read_pgm, METH_VARARGS,
     "read_pgm(path) -> (H, W) uint8 grey array"},
    {"normalize_u8", py_normalize_u8, METH_VARARGS,
     "normalize_u8(u8 array) -> float32 array / 255"},
    {"rgb_to_grey", py_rgb_to_grey, METH_VARARGS,
     "rgb_to_grey((H,W,3) u8) -> (H,W) u8 via OpenCV coefficients"},
    {"encode_e2v2", py_encode_e2v2, METH_VARARGS,
     "encode_e2v2((H,W) u8 [, bucket [, want_digest]]) -> wire buffer u8 "
     "array or None; with want_digest, (buffer_or_None, 16-byte digest)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_host_native",
    "Native host runtime for popsift_tpu", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__host_native(void) {
    import_array();
    return PyModule_Create(&kModule);
}
