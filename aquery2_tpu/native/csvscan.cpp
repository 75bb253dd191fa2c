// Fast multithreaded CSV scanner for numeric columns.
//
// TPU-native counterpart of the reference's vendored fast-cpp-csv-parser
// fork (csv.h, used by the LOAD COMPLEX DATA codegen, engine/ast.py:
// 1448-1496). Design differs deliberately: instead of a header-only
// template reader instantiated per generated snippet, this is one small
// shared library with a C ABI called from Python via ctypes — the host-
// side ingest feeding device columns.
//
//   - mmap-free: reads whole file once (page-cache friendly), splits into
//     per-thread chunks on row boundaries, parses in parallel
//   - two-pass: count rows, then parse directly into caller-provided
//     column buffers (no realloc, no per-cell allocation)
//   - supported cell types: i = int32, l = int64, f = float32, d = float64
//     (string columns are dictionary-encoded host-side in Python; mixed
//     schemas fall back to the Python/pandas reader)
//
// Build: make -C aquery2_tpu/native
// ABI:
//   int64 aq_csv_count_rows(const char* data, int64 len, char sep);
//   int   aq_csv_parse(const char* data, int64 len, char sep, int skip,
//                      const char* colspec, int ncols,
//                      void** out_cols, int64 nrows, int nthreads);
// Returns 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {

static inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

static inline int64_t parse_i64(const char* p, const char* end, const char** out) {
    p = skip_ws(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = *p == '-'; ++p; }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
    *out = p;
    return neg ? -v : v;
}

static inline double parse_f64(const char* p, const char* end, const char** out) {
    p = skip_ws(p, end);
    // fast path: [-]digits[.digits][e[+-]digits]
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = *p == '-'; ++p; }
    double v = 0.0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10.0 + (*p - '0'); ++p; any = true; }
    if (p < end && *p == '.') {
        ++p;
        double scale = 0.1;
        while (p < end && *p >= '0' && *p <= '9') { v += (*p - '0') * scale; scale *= 0.1; ++p; any = true; }
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        ++p;
        const char* q;
        int64_t ex = parse_i64(p, end, &q);
        p = q;
        v = v * pow(10.0, (double)ex);
    }
    (void)any;
    *out = p;
    return neg ? -v : v;
}

int64_t aq_csv_count_rows(const char* data, int64_t len, char sep) {
    (void)sep;
    int64_t rows = 0;
    for (int64_t i = 0; i < len; ++i)
        if (data[i] == '\n') ++rows;
    if (len > 0 && data[len - 1] != '\n') ++rows;  // last line w/o newline
    return rows;
}

struct ChunkJob {
    const char* begin;
    const char* end;       // chunk end (at a row boundary)
    int64_t row_offset;    // first row index of this chunk
};

static inline bool cell_is_empty(const char* p, const char* end, char sep) {
    p = skip_ws(p, end);
    return p >= end || *p == sep || *p == '\n';
}

static void parse_chunk(const ChunkJob& job, char sep, const char* colspec,
                        int ncols, void** out_cols, uint8_t** out_valid,
                        int64_t* null_counts, int64_t nrows, int* err) {
    const char* p = job.begin;
    const char* end = job.end;
    int64_t row = job.row_offset;
    while (p < end && row < nrows) {
        for (int c = 0; c < ncols; ++c) {
            const char* q = p;
            // empty cell = SQL NULL (reference loads via MonetDB COPY,
            // which nulls empties): store 0 + validity 0
            bool empty = cell_is_empty(p, end, sep);
            if (empty && null_counts) null_counts[c]++;
            if (out_valid && out_valid[c]) out_valid[c][row] = !empty;
            switch (colspec[c]) {
                case 'i':
                    ((int32_t*)out_cols[c])[row] = (int32_t)parse_i64(p, end, &q);
                    break;
                case 'l':
                    ((int64_t*)out_cols[c])[row] = parse_i64(p, end, &q);
                    break;
                case 'f':
                    ((float*)out_cols[c])[row] = (float)parse_f64(p, end, &q);
                    break;
                case 'd':
                    ((double*)out_cols[c])[row] = parse_f64(p, end, &q);
                    break;
                default:
                    *err = -2;
                    return;
            }
            p = q;
            // advance past separator / end of row
            while (p < end && *p != sep && *p != '\n') ++p;
            if (p < end && *p == sep && c + 1 < ncols) ++p;
        }
        while (p < end && *p != '\n') ++p;  // tolerate trailing fields
        if (p < end) ++p;                   // consume newline
        ++row;
    }
}

// out_valid: per-column uint8 validity buffers (may be NULL, or hold NULL
// entries) — 1 = value present, 0 = empty cell (SQL NULL).
// null_counts: per-column running totals of empty cells (may be NULL).
int aq_csv_parse2(const char* data, int64_t len, char sep, int skip,
                  const char* colspec, int ncols, void** out_cols,
                  uint8_t** out_valid, int64_t* null_counts,
                  int64_t nrows, int nthreads) {
    if (ncols <= 0 || nrows < 0) return -1;
    const char* p = data;
    const char* end = data + len;
    for (int s = 0; s < skip && p < end; ++s) {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || nrows < 65536) {
        int err = 0;
        ChunkJob job{p, end, 0};
        parse_chunk(job, sep, colspec, ncols, out_cols, out_valid,
                    null_counts, nrows, &err);
        return err;
    }
    // split body into nthreads chunks on row boundaries; we must know the
    // row index at each chunk start → count newlines per raw slice first
    std::vector<ChunkJob> jobs;
    int64_t body_len = end - p;
    std::vector<const char*> starts(nthreads + 1);
    starts[0] = p;
    for (int t = 1; t < nthreads; ++t) {
        const char* q = p + (body_len * t) / nthreads;
        while (q < end && *q != '\n') ++q;
        if (q < end) ++q;
        starts[t] = q;
    }
    starts[nthreads] = end;
    // row offsets: count newlines in [p, start_t)
    std::vector<int64_t> offsets(nthreads, 0);
    {
        std::vector<std::thread> counters;
        std::vector<int64_t> counts(nthreads, 0);
        for (int t = 0; t < nthreads; ++t) {
            counters.emplace_back([&, t] {
                int64_t c = 0;
                for (const char* q = starts[t]; q < starts[t + 1]; ++q)
                    if (*q == '\n') ++c;
                if (t == nthreads - 1 && len > 0 && data[len - 1] != '\n') ++c;
                counts[t] = c;
            });
        }
        for (auto& th : counters) th.join();
        int64_t acc = 0;
        for (int t = 0; t < nthreads; ++t) { offsets[t] = acc; acc += counts[t]; }
    }
    std::vector<int> errs(nthreads, 0);
    std::vector<std::vector<int64_t>> tnulls(
        nthreads, std::vector<int64_t>(ncols, 0));
    std::vector<std::thread> workers;
    for (int t = 0; t < nthreads; ++t) {
        ChunkJob job{starts[t], starts[t + 1], offsets[t]};
        workers.emplace_back([&, job, t] {
            parse_chunk(job, sep, colspec, ncols, out_cols, out_valid,
                        null_counts ? tnulls[t].data() : nullptr,
                        nrows, &errs[t]);
        });
    }
    for (auto& th : workers) th.join();
    if (null_counts)
        for (int t = 0; t < nthreads; ++t)
            for (int c = 0; c < ncols; ++c) null_counts[c] += tnulls[t][c];
    for (int e : errs) if (e) return e;
    return 0;
}

// legacy entry (no null tracking) kept for ABI stability
int aq_csv_parse(const char* data, int64_t len, char sep, int skip,
                 const char* colspec, int ncols, void** out_cols,
                 int64_t nrows, int nthreads) {
    return aq_csv_parse2(data, len, sep, skip, colspec, ncols, out_cols,
                         nullptr, nullptr, nrows, nthreads);
}

}  // extern "C"
