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

PyObject* py_encode_e2v2(PyObject*, PyObject* args) {
    PyObject* in = nullptr;
    long bucket = 128 * 1024;
    if (!PyArg_ParseTuple(args, "O|l", &in, &bucket)) return nullptr;
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
    std::memset(esc2_count, 0, sizeof(esc2_count));
    std::memset(esc4_count, 0, sizeof(esc4_count));

    Py_BEGIN_ALLOW_THREADS
    // pass 1: mod-256 second-difference residuals + per-chunk escape
    // counts for both code widths (rows are independent given src)
    parallel_for(nchunks, 1, [&](int64_t clo, int64_t chi) {
        for (int64_t c = clo; c < chi; ++c) {
            int64_t y0 = c * rows_per, y1 = y0 + rows_per;
            if (y1 > h) y1 = h;
            int64_t e2 = 0, e4 = 0;
            for (int64_t y = y0; y < y1; ++y) {
                const uint8_t* row = src + y * w;
                const uint8_t* up = y ? src + (y - 1) * w : nullptr;
                uint8_t* rrow = res.data() + y * w;
                for (int64_t x = 0; x < w; ++x) {
                    uint8_t left = x ? row[x - 1] : 0;
                    uint8_t upv = up ? up[x] : 0;
                    uint8_t ul = (up && x) ? up[x - 1] : 0;
                    uint8_t d = static_cast<uint8_t>(
                        row[x] - left - upv + ul);
                    rrow[x] = d;
                    e2 += (d > 1 && d < 255);
                    int8_t sd = static_cast<int8_t>(d);
                    uint8_t z = static_cast<uint8_t>(
                        (sd << 1) ^ (sd >> 7));
                    e4 += (z >= kE4Esc);
                }
            }
            esc2_count[c] = e2;
            esc4_count[c] = e4;
        }
    });
    Py_END_ALLOW_THREADS

    int64_t n_esc2 = 0, n_esc4 = 0;
    for (int c = 0; c < nchunks; ++c) {
        n_esc2 += esc2_count[c];
        n_esc4 += esc4_count[c];
    }
    const int64_t pay2 = kE2HeaderBytes + (total + 3) / 4 + n_esc2;
    const int64_t pay4 = kE2HeaderBytes + (total + 1) / 2 + n_esc4;
    if (pay2 >= total && pay4 >= total) {
        Py_DECREF(arr);
        Py_RETURN_NONE;
    }
    const int bits = pay2 <= pay4 ? 2 : 4;
    const int64_t n_esc = bits == 2 ? n_esc2 : n_esc4;
    const int64_t* esc_count = bits == 2 ? esc2_count : esc4_count;
    int64_t esc_off[nchunks];
    {
        int64_t acc = 0;
        for (int c = 0; c < nchunks; ++c) {
            esc_off[c] = acc;
            acc += esc_count[c];
        }
    }
    const int64_t per_byte = 8 / bits;
    const int64_t slen = (total + per_byte - 1) / per_byte;
    const int64_t payload = kE2HeaderBytes + slen + n_esc;
    const int64_t out_len = (payload + bucket - 1) / bucket * bucket;

    npy_intp dims[1] = {out_len};
    PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
        PyArray_ZEROS(1, dims, NPY_UINT8, 0));
    if (!out) {
        Py_DECREF(arr);
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
    if (bits == 2) {
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
            if (bits == 2) {
                for (; r < rend; ++r) {
                    if (*r > 1 && *r < 255) *e++ = *r;
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
     "encode_e2v2((H,W) u8 [, bucket]) -> wire buffer u8 array or None"},
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
