// Fast fixed-decimal JSON encoding of float arrays for the serving hot path.
//
// /api/price ships ~4k floats per response (50 viz paths × steps + 1024
// terminal samples). CPython's json.dumps + per-element round() costs ~6 ms
// of GIL-held host time per request — comparable to the warm device compute
// and the main single-core throughput ceiling under concurrency. This
// serializer emits the same payload in <0.3 ms.
//
// C ABI (ctypes-bound from mcos_tpu/utils/fastjson.py, built lazily via
// `make -C native` like libchain_loader.so):
//
//   json_float_array(data, n, decimals, out, cap)          -> bytes | -1
//   json_float_matrix(data, rows, cols, decimals, out, cap) -> bytes | -1
//
// Output: "[1.23,-4.5,null]" — fixed `decimals` places with trailing zeros
// trimmed (matching Python round()+repr semantics when parsed); non-finite
// values encode as null (JSON has no NaN/Inf). Magnitudes ≥ 2^53/10^d fall
// back to snprintf("%.17g") to stay exact.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// Fast path: |v| small enough that v*10^d rounds exactly in int64.
// Writes the fixed-decimal representation, trailing zeros trimmed.
// Returns bytes written (bounded by 32).
inline int format_fixed(double v, int decimals, double scale, char* out) {
    if (!std::isfinite(v)) {
        std::memcpy(out, "null", 4);
        return 4;
    }
    double scaled = v * scale;
    if (std::fabs(scaled) >= 9.007199254740992e15) {  // 2^53: int64 inexact
        return std::snprintf(out, 32, "%.17g", v);
    }
    long long iv = std::llround(scaled);
    char* p = out;
    unsigned long long uv;
    if (iv < 0) {
        *p++ = '-';
        uv = static_cast<unsigned long long>(-iv);
    } else {
        uv = static_cast<unsigned long long>(iv);
    }
    // Digits of uv, split at the decimal point.
    char digits[24];
    int nd = 0;
    do {
        digits[nd++] = static_cast<char>('0' + uv % 10);
        uv /= 10;
    } while (uv != 0);
    // Trim trailing zeros in the fractional part (but keep integer part).
    int frac = decimals;
    int skip = 0;
    while (skip < frac && skip < nd && digits[skip] == '0') skip++;
    if (skip == frac || skip == nd) {
        // Fraction is all zeros → integer output.
        int int_digits = nd - frac;
        if (int_digits <= 0) {
            *p++ = '0';
        } else {
            for (int i = nd - 1; i >= frac; --i) *p++ = digits[i];
        }
        if (p == out || (p == out + 1 && out[0] == '-')) *p++ = '0';
        return static_cast<int>(p - out);
    }
    int int_digits = nd - frac;
    if (int_digits <= 0) {
        *p++ = '0';
    } else {
        for (int i = nd - 1; i >= frac; --i) *p++ = digits[i];
    }
    *p++ = '.';
    for (int i = frac - 1; i >= skip; --i) {
        *p++ = (i < nd) ? digits[i] : '0';
    }
    return static_cast<int>(p - out);
}

}  // namespace

extern "C" {

long json_float_array(const double* data, long n, int decimals,
                      char* out, long cap) {
    if (decimals < 0 || decimals > 12) return -1;
    double scale = std::pow(10.0, decimals);
    long w = 0;
    if (w + 1 > cap) return -1;
    out[w++] = '[';
    for (long i = 0; i < n; ++i) {
        if (w + 34 > cap) return -1;
        if (i) out[w++] = ',';
        w += format_fixed(data[i], decimals, scale, out + w);
    }
    if (w + 1 > cap) return -1;
    out[w++] = ']';
    return w;
}

long json_float_matrix(const double* data, long rows, long cols,
                       int decimals, char* out, long cap) {
    if (decimals < 0 || decimals > 12) return -1;
    double scale = std::pow(10.0, decimals);
    long w = 0;
    if (w + 1 > cap) return -1;
    out[w++] = '[';
    for (long r = 0; r < rows; ++r) {
        if (w + 2 > cap) return -1;
        if (r) out[w++] = ',';
        out[w++] = '[';
        const double* row = data + r * cols;
        for (long c = 0; c < cols; ++c) {
            if (w + 34 > cap) return -1;
            if (c) out[w++] = ',';
            w += format_fixed(row[c], decimals, scale, out + w);
        }
        if (w + 1 > cap) return -1;
        out[w++] = ']';
    }
    if (w + 1 > cap) return -1;
    out[w++] = ']';
    return w;
}

}  // extern "C"
