// Fast Lowe-format key file parsing.
//
// The reference's runtime I/O layer is C++ (`src/keys2a.cpp` ReadKeys /
// ReadKeysGzip); this is the equivalent native component for the TPU
// framework: Python handles file/gzip access and hands raw ASCII bytes here
// for a single-pass tokenizer ~30x faster than interpreter-side parsing.
//
// Format (src/keys2a.h:81-89): header "<n> 128", then per key one line of
// four floats (row col scale ori) followed by 128 ints in [0,255].

#include <cstdlib>
#include <cstring>
#include <cstdint>

extern "C" {

// Parses the whole file.  info_out: [max_keys*4] floats as (x=col, y=row,
// scale, ori); desc_out: [max_keys*128] bytes.  Returns the number of keys
// parsed, or -1 on malformed input, or -2 if the file holds more than
// max_keys keys.
long long parse_keyfile(const char* data, long long len,
                        float* info_out, unsigned char* desc_out,
                        long long max_keys) {
    const char* p = data;
    const char* end = data + len;

    auto skip_ws = [&]() {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' ||
                           *p == '\t')) p++;
    };
    auto read_double = [&](double* out) -> bool {
        skip_ws();
        if (p >= end) return false;
        char* next = nullptr;
        *out = strtod(p, &next);
        if (next == p) return false;
        p = next;
        return true;
    };

    double nd, dd;
    if (!read_double(&nd) || !read_double(&dd)) return -1;
    long long n = (long long) nd;
    long long dim = (long long) dd;
    if (dim != 128) return -1;
    if (n > max_keys) return -2;

    for (long long i = 0; i < n; i++) {
        double row, col, scale, ori;
        if (!read_double(&row) || !read_double(&col) ||
            !read_double(&scale) || !read_double(&ori)) return -1;
        info_out[4 * i + 0] = (float) col;
        info_out[4 * i + 1] = (float) row;
        info_out[4 * i + 2] = (float) scale;
        info_out[4 * i + 3] = (float) ori;
        unsigned char* d = desc_out + 128 * i;
        for (int k = 0; k < 128; k++) {
            // Descriptor entries are small non-negative ints; a fast
            // integer scan beats strtod here.
            skip_ws();
            if (p >= end) return -1;
            long v = 0;
            bool any = false;
            while (p < end && *p >= '0' && *p <= '9') {
                v = v * 10 + (*p - '0');
                p++;
                any = true;
            }
            if (!any) return -1;
            d[k] = (unsigned char) (v > 255 ? 255 : v);
        }
    }
    return n;
}

}  // extern "C"
