// Fast MatrixMarket coordinate parser (C ABI, loaded via ctypes).
//
// Native-runtime component: the reference library's loaders are plain C
// (read_sbm — SURVEY.md §2 R3); scipy's Python mmread is 20-50x slower on
// large files. Parses "%%MatrixMarket matrix coordinate
// {real|integer|pattern} {general|symmetric}" files with mmap-free
// buffered IO; symmetric inputs are expanded by the Python wrapper.
//
// Build: g++ -O3 -shared -fPIC -o _fastmtx.so fastmtx.cpp
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

struct MtxHeader {
  int64_t nrow;
  int64_t ncol;
  int64_t nnz;
  int32_t pattern;    // 1 if no values stored
  int32_t symmetric;  // 1 if "symmetric"
};

// Returns 0 on success. Fills header from the banner + size line.
int fastmtx_header(const char* path, MtxHeader* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char line[1024];
  if (!fgets(line, sizeof line, f)) { fclose(f); return 2; }
  if (strncmp(line, "%%MatrixMarket", 14) != 0) { fclose(f); return 3; }
  h->pattern = strstr(line, "pattern") != nullptr;
  h->symmetric = strstr(line, "symmetric") != nullptr;
  if (strstr(line, "coordinate") == nullptr) { fclose(f); return 4; }
  if (strstr(line, "complex") != nullptr) { fclose(f); return 5; }
  // skip comments
  do {
    if (!fgets(line, sizeof line, f)) { fclose(f); return 6; }
  } while (line[0] == '%');
  if (sscanf(line, "%lld %lld %lld", (long long*)&h->nrow,
             (long long*)&h->ncol, (long long*)&h->nnz) != 3) {
    fclose(f);
    return 7;
  }
  fclose(f);
  return 0;
}

// Parses entries into caller-allocated arrays (1-based -> 0-based).
// vals may be null for pattern files. Returns number parsed, or -errno.
int64_t fastmtx_read(const char* path, int32_t* rows, int32_t* cols,
                     double* vals, int64_t nnz, int32_t pattern) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[1024];
  // skip banner + comments + size line
  if (!fgets(line, sizeof line, f)) { fclose(f); return -2; }
  do {
    if (!fgets(line, sizeof line, f)) { fclose(f); return -3; }
  } while (line[0] == '%');

  const size_t BUF = 1 << 22;
  char* buf = (char*)malloc(BUF + 64);
  if (!buf) { fclose(f); return -4; }
  int64_t k = 0;
  size_t carry = 0;
  while (k < nnz) {
    size_t got = fread(buf + carry, 1, BUF - carry, f);
    if (got == 0 && carry == 0) break;
    size_t end = carry + got;
    // find last complete line
    size_t last = end;
    if (got != 0) {
      while (last > 0 && buf[last - 1] != '\n') last--;
      if (last == 0) last = end;  // single huge line; parse anyway
    }
    char* p = buf;
    char* stop = buf + last;
    while (p < stop && k < nnz) {
      char* q;
      long r = strtol(p, &q, 10);
      if (q == p) { p++; continue; }
      p = q;
      long c = strtol(p, &q, 10);
      if (q == p) break;
      p = q;
      rows[k] = (int32_t)(r - 1);
      cols[k] = (int32_t)(c - 1);
      if (!pattern) {
        double v = strtod(p, &q);
        p = q;
        if (vals) vals[k] = v;
      }
      k++;
      while (p < stop && *p != '\n') p++;
    }
    carry = end - last;
    if (carry) memmove(buf, buf + last, carry);
    if (got == 0) break;
  }
  free(buf);
  fclose(f);
  return k;
}

}  // extern "C"
