// Native FASTA reader — the kseq.h-equivalent runtime component
// (reference: src/kseq.h + readSequences in src/tree_generation.cu).
//
// Parses plain or gzip FASTA into one contiguous sequence buffer with
// offsets, multithreaded for the newline-stripping copy. Exposed via a
// C ABI consumed with ctypes (dipper_tpu/io/native.py); the Python
// reader falls back to a pure-Python path when this library is absent.
//
// Build: make -C native   (produces libfastio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <charconv>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// Read a whole file, transparently inflating gzip.
static bool read_all(const char* path, std::vector<char>& out) {
    gzFile f = gzopen(path, "rb");
    if (!f) return false;
    gzbuffer(f, 1 << 20);
    const size_t chunk = 16 << 20;
    size_t size = 0;
    for (;;) {
        out.resize(size + chunk);
        int got = gzread(f, out.data() + size, chunk);
        if (got < 0) {
            gzclose(f);
            return false;
        }
        size += static_cast<size_t>(got);
        if (static_cast<size_t>(got) < chunk) break;
    }
    out.resize(size);
    gzclose(f);
    return true;
}

struct Record {
    size_t header_begin, header_end;  // name = header up to first space
    size_t seq_begin, seq_end;        // raw region incl. newlines
};

}  // namespace

extern "C" {

// Returns 0 on success. Outputs are malloc'd; release with fastio_free.
//   seqs:     concatenated sequence bytes (newlines stripped)
//   offsets:  int64[n+1] boundaries into seqs
//   names:    concatenated NUL-terminated names
//   n:        record count
int fastio_read_fasta(const char* path, uint8_t** seqs_out,
                      int64_t** offsets_out, char** names_out,
                      int64_t* names_len_out, int64_t* n_out) {
    std::vector<char> data;
    if (!read_all(path, data)) return 1;
    const char* d = data.data();
    const size_t len = data.size();

    // index records
    std::vector<Record> recs;
    size_t i = 0;
    while (i < len && d[i] != '>') i++;
    while (i < len) {
        // at '>'
        Record r;
        r.header_begin = i + 1;
        size_t j = i + 1;
        while (j < len && d[j] != '\n') j++;
        r.header_end = j;
        r.seq_begin = (j < len) ? j + 1 : j;
        size_t k = r.seq_begin;
        while (k < len && d[k] != '>') k++;
        r.seq_end = k;
        recs.push_back(r);
        i = k;
    }
    const int64_t n = static_cast<int64_t>(recs.size());

    // offsets: count non-newline bytes per record
    std::vector<int64_t> lens(n, 0);
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = hw ? static_cast<int>(hw) : 4;
    if (nthreads > n && n > 0) nthreads = static_cast<int>(n);
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nthreads; t++) {
            ts.emplace_back([&, t]() {
                for (int64_t r = t; r < n; r += nthreads) {
                    int64_t c = 0;
                    for (size_t p = recs[r].seq_begin; p < recs[r].seq_end; p++)
                        if (d[p] != '\n' && d[p] != '\r') c++;
                    lens[r] = c;
                }
            });
        }
        for (auto& th : ts) th.join();
    }

    int64_t* offsets =
        static_cast<int64_t*>(malloc((n + 1) * sizeof(int64_t)));
    offsets[0] = 0;
    for (int64_t r = 0; r < n; r++) offsets[r + 1] = offsets[r] + lens[r];
    const int64_t total = offsets[n];
    uint8_t* seqs = static_cast<uint8_t*>(malloc(total ? total : 1));

    // strip newlines in parallel
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nthreads; t++) {
            ts.emplace_back([&, t]() {
                for (int64_t r = t; r < n; r += nthreads) {
                    uint8_t* w = seqs + offsets[r];
                    for (size_t p = recs[r].seq_begin; p < recs[r].seq_end; p++) {
                        char c = d[p];
                        if (c != '\n' && c != '\r') *w++ = static_cast<uint8_t>(c);
                    }
                }
            });
        }
        for (auto& th : ts) th.join();
    }

    // names (header up to first whitespace), NUL-separated
    std::string names;
    names.reserve(n * 16);
    for (int64_t r = 0; r < n; r++) {
        size_t b = recs[r].header_begin;
        size_t e = b;
        while (e < recs[r].header_end && d[e] != ' ' && d[e] != '\t' &&
               d[e] != '\r')
            e++;
        names.append(d + b, e - b);
        names.push_back('\0');
    }
    char* names_buf = static_cast<char*>(malloc(names.size() ? names.size() : 1));
    memcpy(names_buf, names.data(), names.size());

    *seqs_out = seqs;
    *offsets_out = offsets;
    *names_out = names_buf;
    *names_len_out = static_cast<int64_t>(names.size());
    *n_out = n;
    return 0;
}

// Lower-triangular PHYLIP distance matrix parser (reference streams
// rows with fscanf, src/matrix_reader.cu:23-45). Multithreaded: rows
// are located serially, parsed in parallel.
//   values: double[n*(n-1)/2], row-major lower triangle (row i has i
//           entries starting at i*(i-1)/2)
//   names:  concatenated NUL-terminated taxon names
int fastio_read_phylip_lower(const char* path, double** values_out,
                             char** names_out, int64_t* names_len_out,
                             int64_t* n_out) {
    std::vector<char> data;
    if (!read_all(path, data)) return 1;
    const char* d = data.data();
    const size_t len = data.size();

    size_t i = 0;
    auto skip_ws = [&](size_t p) {
        while (p < len && (d[p] == ' ' || d[p] == '\t' || d[p] == '\r')) p++;
        return p;
    };
    // header: leading integer N (rest of line ignored)
    i = skip_ws(i);
    int64_t n = 0;
    while (i < len && d[i] >= '0' && d[i] <= '9') n = n * 10 + (d[i++] - '0');
    while (i < len && d[i] != '\n') i++;
    if (i < len) i++;
    if (n <= 0) return 2;

    // locate row line boundaries
    std::vector<std::pair<size_t, size_t>> rows;
    rows.reserve(n);
    while (i < len && static_cast<int64_t>(rows.size()) < n) {
        size_t b = i;
        while (i < len && d[i] != '\n') i++;
        rows.emplace_back(b, i);
        if (i < len) i++;
    }
    if (static_cast<int64_t>(rows.size()) < n) return 3;

    double* values =
        static_cast<double*>(malloc(sizeof(double) * (n * (n - 1) / 2 + 1)));
    std::vector<std::string> name_vec(n);
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = hw ? static_cast<int>(hw) : 4;
    if (nthreads > n) nthreads = static_cast<int>(n);
    std::vector<int> errs(nthreads, 0);
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nthreads; t++) {
            ts.emplace_back([&, t]() {
                for (int64_t r = t; r < n; r += nthreads) {
                    size_t p = skip_ws(rows[r].first);
                    const size_t e = rows[r].second;
                    size_t nb = p;
                    while (p < e && d[p] != ' ' && d[p] != '\t' &&
                           d[p] != '\r')
                        p++;
                    name_vec[r].assign(d + nb, p - nb);
                    double* w = values + r * (r - 1) / 2;
                    for (int64_t c = 0; c < r; c++) {
                        p = skip_ws(p);
                        if (p >= e) { errs[t] = 1; return; }
                        auto res = std::from_chars(d + p, d + e, w[c]);
                        if (res.ec != std::errc()) { errs[t] = 1; return; }
                        p = res.ptr - d;
                    }
                }
            });
        }
        for (auto& th : ts) th.join();
    }
    for (int t = 0; t < nthreads; t++)
        if (errs[t]) {
            free(values);
            return 4;
        }

    std::string names;
    names.reserve(n * 16);
    for (int64_t r = 0; r < n; r++) {
        names.append(name_vec[r]);
        names.push_back('\0');
    }
    char* names_buf =
        static_cast<char*>(malloc(names.size() ? names.size() : 1));
    memcpy(names_buf, names.data(), names.size());

    *values_out = values;
    *names_out = names_buf;
    *names_len_out = static_cast<int64_t>(names.size());
    *n_out = n;
    return 0;
}

void fastio_free(void* p) { free(p); }

}  // extern "C"
