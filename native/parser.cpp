// Fast two-pass text parser for the one-class FFM data formats.
//
// Native equivalent of the reference's C++ loader (ImpData::read,
// /root/reference/ffm.cpp:80-183), exposed to Python through a C ABI
// (ctypes binding in one_class_ffm_tpu/data/native_io.py).  Same semantics
// as the pure-Python fallback parser (data/io.py):
//   * line = "[label1,label2,...] fid:idx:val ..." (label block only when
//     has_label)
//   * n = max label id + 1; f = max field id + 1 counted over ALL features,
//     including ones the ds-filter later drops
//   * ds filter: drop features with fid >= n_ds or idx >= ds[fid]
//   * blank lines are empty rows
//
// Pass 1 counts rows and post-filter nnz so Python can allocate exact
// buffers; pass 2 fills them.  ~40x the Python parser's throughput.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

struct ParseCounts {
    int64_t rows;
    int64_t x_nnz;
    int64_t y_nnz;
    int64_t n;  // label dimension
    int32_t f;  // field count
};

// Returns 0 on success, -1 on open failure, -2 on malformed feature.
static int parse_pass(const char* path, int has_label, const int64_t* ds,
                      int64_t n_ds, ParseCounts* counts, int64_t* x_indptr,
                      int32_t* x_fid, int64_t* x_idx, double* x_val,
                      int64_t* y_indptr, int64_t* y_idx, int fill) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;

    // big stdio buffer: parsing is sequential
    static const size_t BUF = 1 << 20;
    char* iobuf = (char*)malloc(BUF);
    setvbuf(fp, iobuf, _IOFBF, BUF);

    size_t cap = 1 << 20;
    char* line = (char*)malloc(cap);

    int64_t rows = 0, x_nnz = 0, y_nnz = 0, n = 0;
    int32_t f = 0;
    int rc = 0;

    if (fill) {
        x_indptr[0] = 0;
        if (has_label) y_indptr[0] = 0;
    }

    while (true) {
        // getline-style read (handles arbitrarily long lines)
        size_t len = 0;
        int eof = 0;
        while (true) {
            if (!fgets(line + len, (int)(cap - len), fp)) {
                eof = 1;
                break;
            }
            len += strlen(line + len);
            if (len && line[len - 1] == '\n') {
                line[--len] = '\0';
                break;
            }
            if (len + 1 >= cap) {
                cap *= 2;
                line = (char*)realloc(line, cap);
            } else {
                break;  // EOF without newline
            }
        }
        if (eof && len == 0) break;

        char* p = line;
        while (*p == ' ' || *p == '\t') p++;

        if (has_label && *p) {
            // label block: comma-separated ids up to first whitespace
            while (*p && *p != ' ' && *p != '\t') {
                char* end;
                long long j = strtoll(p, &end, 10);
                if (end == p) {
                    rc = -2;
                    goto done;
                }
                if (j + 1 > n) n = j + 1;
                if (fill) y_idx[y_nnz] = (int64_t)j;
                y_nnz++;
                p = end;
                if (*p == ',') p++;
            }
        }

        // features
        while (*p) {
            while (*p == ' ' || *p == '\t') p++;
            if (!*p) break;
            char* end;
            long long fid = strtoll(p, &end, 10);
            if (end == p || *end != ':') {
                rc = -2;
                goto done;
            }
            p = end + 1;
            long long idx = strtoll(p, &end, 10);
            if (end == p || *end != ':') {
                rc = -2;
                goto done;
            }
            p = end + 1;
            double val = strtod(p, &end);
            if (end == p) {
                rc = -2;
                goto done;
            }
            p = end;
            if ((int32_t)(fid + 1) > f) f = (int32_t)(fid + 1);
            if (ds != nullptr && (fid >= n_ds || ds[fid] <= idx)) continue;
            if (fill) {
                x_fid[x_nnz] = (int32_t)fid;
                x_idx[x_nnz] = (int64_t)idx;
                x_val[x_nnz] = val;
            }
            x_nnz++;
        }

        rows++;
        if (fill) {
            x_indptr[rows] = x_nnz;
            if (has_label) y_indptr[rows] = y_nnz;
        }
        if (eof) break;
    }

done:
    free(line);
    fclose(fp);
    free(iobuf);
    if (rc) return rc;
    counts->rows = rows;
    counts->x_nnz = x_nnz;
    counts->y_nnz = y_nnz;
    counts->n = n;
    counts->f = f;
    return 0;
}

int ocffm_count(const char* path, int has_label, const int64_t* ds,
                int64_t n_ds, ParseCounts* counts) {
    return parse_pass(path, has_label, ds, n_ds, counts, nullptr, nullptr,
                      nullptr, nullptr, nullptr, nullptr, 0);
}

int ocffm_fill(const char* path, int has_label, const int64_t* ds,
               int64_t n_ds, ParseCounts* counts, int64_t* x_indptr,
               int32_t* x_fid, int64_t* x_idx, double* x_val,
               int64_t* y_indptr, int64_t* y_idx) {
    return parse_pass(path, has_label, ds, n_ds, counts, x_indptr, x_fid,
                      x_idx, x_val, y_indptr, y_idx, 1);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fast text-model writer (the reference's save_model format,
// /root/reference/ffm.cpp:1163-1237): rows "W,f1,f2,row v1 .. vk" with %g
// formatting.  Python's per-row f-string writer takes minutes for
// multi-million-row tables; this streams one block in C++.
// ---------------------------------------------------------------------------

extern "C" {

// Appends one block table to the (already open-for-append) file.
// Returns 0 on success, -1 on open failure.
int ocffm_write_block(const char* path, const char* name, int f1, int f2,
                      const double* table, int64_t rows, int64_t k) {
    FILE* fp = fopen(path, "ab");
    if (!fp) return -1;
    static const size_t BUF = 1 << 20;
    char* iobuf = (char*)malloc(BUF);
    setvbuf(fp, iobuf, _IOFBF, BUF);
    for (int64_t r = 0; r < rows; r++) {
        fprintf(fp, "%s,%d,%d,%lld", name, f1, f2, (long long)r);
        const double* row = table + r * k;
        for (int64_t c = 0; c < k; c++) fprintf(fp, " %.6g", row[c]);
        fputc('\n', fp);
    }
    fclose(fp);
    free(iobuf);
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fast text-model READER (pairs with ocffm_write_block): parses the body
// lines "N,f1,f2,row v1 .. vk" of the reference model format
// (/root/reference/ffm.cpp:1176-1222).  Python parses the tiny header and
// passes the body byte offset; pass 1 (fill=0) counts lines, pass 2 fills
// flat arrays the Python side groups into block tables.  Replaces per-token
// Python float parsing (minutes and GBs of transient objects on
// multi-million-row models).
// ---------------------------------------------------------------------------

extern "C" {

int ocffm_read_model(const char* path, long long offset, int64_t k,
                     int64_t* n_rows_io, int8_t* name, int32_t* bf1,
                     int32_t* bf2, int64_t* brow, double* vals, int fill) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    static const size_t BUF = 1 << 20;
    char* iobuf = (char*)malloc(BUF);
    setvbuf(fp, iobuf, _IOFBF, BUF);
    if (fseek(fp, (long)offset, SEEK_SET) != 0) {
        fclose(fp);
        free(iobuf);
        return -2;
    }
    char* line = nullptr;
    size_t cap = 0;
    int64_t nrows = 0;
    int rc = 0;
    while (true) {
        ssize_t len = getline(&line, &cap, fp);
        if (len < 0) break;
        char* p = line;
        while (*p == ' ' || *p == '\t') p++;
        if (*p == '\n' || *p == '\0') continue;  // blank line
        if (fill) {
            if (nrows >= *n_rows_io) { rc = -4; break; }
            // "W,f1,f2,row v1 .. vk"
            char nm = *p;
            if (nm != 'W' && nm != 'H') { rc = -3; break; }
            p++;
            if (*p++ != ',') { rc = -3; break; }
            char* end;
            long f1 = strtol(p, &end, 10);
            if (end == p || *end != ',') { rc = -3; break; }
            p = end + 1;
            long f2 = strtol(p, &end, 10);
            if (end == p || *end != ',') { rc = -3; break; }
            p = end + 1;
            long long row = strtoll(p, &end, 10);
            if (end == p) { rc = -3; break; }
            p = end;
            name[nrows] = (nm == 'W') ? 0 : 1;
            bf1[nrows] = (int32_t)f1;
            bf2[nrows] = (int32_t)f2;
            brow[nrows] = (int64_t)row;
            double* out = vals + nrows * k;
            for (int64_t c = 0; c < k; c++) {
                double v = strtod(p, &end);
                if (end == p) { rc = -3; goto done; }
                out[c] = v;
                p = end;
            }
        }
        nrows++;
    }
done:
    free(line);
    fclose(fp);
    free(iobuf);
    if (rc) return rc;
    *n_rows_io = nrows;
    return 0;
}

}  // extern "C"
