// Fast long-format CSV parser for data.io.load_long_csv.
//
// The clinical ingestion path (MIMIC-style one-row-per-observation exports)
// can reach tens of millions of rows; Python's csv.DictReader allocates a
// dict per row and parses floats through PyFloat, which dominates load time.
// This kernel does the hot work natively: one pass over a heap buffer,
// splitting unquoted CSV lines, strtod-parsing time/value, and interning the
// subject/task strings via an open-addressing hash into caller-provided
// arenas.  Quoted fields are NOT handled — the loader detects a '"' and
// falls back to the exact Python path (csv module semantics).
//
// Contract (see native/__init__.py bindings):
//   csv_row_count(path)  -> upper bound on data rows (newline count), or -1.
//   parse_long_csv(...)  -> number of rows parsed, or -1 on ANY condition
//                           the native path cannot serve faithfully: IO
//                           error, quote character (csv-module semantics),
//                           a row strtod cannot parse exactly like Python
//                           float() (including locale differences, '_'
//                           separators, hex floats, non-finite values),
//                           or label-arena overflow.  The caller falls back
//                           to the exact csv-module path, which either
//                           loads the file or raises the canonical error
//                           with full row context — the native tier NEVER
//                           produces a data error itself.
//
// Exact behavioral parity with the Python path is enforced by
// tests/test_io_csv.py (both paths run the same test matrix).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct Interner {
  // open addressing over offsets into the arena; arena holds NUL-joined
  // unique strings in first-seen order.  The table GROWS (rehash at 50%
  // load) so arbitrary label cardinality — MIMIC-scale subject counts —
  // never deadlocks the probe loop; only arena exhaustion fails (-1, which
  // the parser surfaces as "fall back to Python").
  int64_t *slots = nullptr;  // offset+1 into arena, 0 = empty
  int32_t *codes_ = nullptr;
  int64_t n_slots = 0;
  char *arena;
  int64_t arena_len = 0;
  int64_t arena_cap;
  int32_t n_unique = 0;

  bool init(int64_t expected, char *arena_buf, int64_t cap) {
    n_slots = 64;
    while (n_slots < 4 * expected) n_slots <<= 1;
    slots = static_cast<int64_t *>(calloc(n_slots, sizeof(int64_t)));
    codes_ = static_cast<int32_t *>(calloc(n_slots, sizeof(int32_t)));
    arena = arena_buf;
    arena_cap = cap;
    return slots != nullptr && codes_ != nullptr;
  }
  ~Interner() {
    free(slots);
    free(codes_);
  }

  static uint64_t hash(const char *s, int64_t len) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t i = 0; i < len; ++i)
      h = (h ^ static_cast<unsigned char>(s[i])) * 1099511628211ull;
    return h;
  }

  bool grow() {
    int64_t new_n = n_slots << 1;
    int64_t *ns = static_cast<int64_t *>(calloc(new_n, sizeof(int64_t)));
    int32_t *nc = static_cast<int32_t *>(calloc(new_n, sizeof(int32_t)));
    if (!ns || !nc) {
      free(ns);
      free(nc);
      return false;
    }
    int64_t mask = new_n - 1;
    for (int64_t i = 0; i < n_slots; ++i) {
      if (slots[i] == 0) continue;
      const char *s = arena + (slots[i] - 1);
      int64_t j = static_cast<int64_t>(hash(s, std::strlen(s))) & mask;
      while (ns[j] != 0) j = (j + 1) & mask;
      ns[j] = slots[i];
      nc[j] = codes_[i];
    }
    free(slots);
    free(codes_);
    slots = ns;
    codes_ = nc;
    n_slots = new_n;
    return true;
  }

  // returns code (index in first-seen order) or -1 on overflow
  int32_t intern(const char *s, int64_t len) {
    if (2 * (n_unique + 1) > n_slots && !grow()) return -1;
    int64_t mask = n_slots - 1;
    int64_t j = static_cast<int64_t>(hash(s, len)) & mask;
    for (;;) {
      int64_t off = slots[j];
      if (off == 0) {
        if (arena_len + len + 1 > arena_cap) return -1;
        std::memcpy(arena + arena_len, s, len);
        arena[arena_len + len] = '\0';
        slots[j] = arena_len + 1;
        arena_len += len + 1;
        codes_[j] = n_unique;
        return n_unique++;
      }
      const char *stored = arena + (off - 1);
      if (static_cast<int64_t>(std::strlen(stored)) == len &&
          std::memcmp(stored, s, len) == 0)
        return codes_[j];
      j = (j + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

long long csv_row_count(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  long long count = 0;
  char buf[1 << 16];
  size_t got;
  while ((got = std::fread(buf, 1, sizeof(buf), f)) > 0) {
    const char *p = buf, *end = buf + got;
    while ((p = static_cast<const char *>(std::memchr(p, '\n', end - p)))) {
      ++count;
      ++p;
    }
  }
  std::fclose(f);
  return count + 1;  // last line may lack a trailing newline
}

long long parse_long_csv(const char *path, int time_col, int task_col,
                         int value_col, int subject_col,
                         double *times, double *values, int32_t *task_codes,
                         int32_t *subj_codes, char *task_arena,
                         long long task_arena_cap, long long *task_arena_len,
                         int32_t *n_tasks, char *subj_arena,
                         long long subj_arena_cap, long long *subj_arena_len,
                         int32_t *n_subjects, long long rows_cap) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char *buf = static_cast<char *>(malloc(size + 1));
  if (!buf) {
    std::fclose(f);
    return -1;
  }
  if (std::fread(buf, 1, size, f) != static_cast<size_t>(size)) {
    free(buf);
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';
  if (std::memchr(buf, '"', size)) {
    free(buf);
    return -1;  // quoted CSV: fall back to the csv-module path
  }

  Interner tasks, subjects;
  if (!tasks.init(1024, task_arena, task_arena_cap) ||
      !subjects.init(1 << 12, subj_arena, subj_arena_cap)) {
    free(buf);
    return -1;
  }

  int max_col = time_col;
  if (task_col > max_col) max_col = task_col;
  if (value_col > max_col) max_col = value_col;
  if (subject_col > max_col) max_col = subject_col;

  long long n = 0;
  char *p = buf;
  char *end = buf + size;
  bool header = true;
  bool bad = false;
  while (p < end && n < rows_cap) {
    char *eol = static_cast<char *>(std::memchr(p, '\n', end - p));
    char *line_end = eol ? eol : end;
    // strip trailing \r
    char *le = line_end;
    if (le > p && le[-1] == '\r') --le;
    if (le == p) {  // empty line
      p = eol ? eol + 1 : end;
      continue;
    }
    if (header) {  // header parsed Python-side (column indices given)
      header = false;
      p = eol ? eol + 1 : end;
      continue;
    }
    // split into fields; record [start, len) of the 4 interesting columns
    const char *fs[4] = {nullptr, nullptr, nullptr, nullptr};
    int64_t fl[4] = {0, 0, 0, 0};
    int col = 0;
    char *fstart = p;
    for (char *q = p;; ++q) {
      if (q == le || *q == ',') {
        if (col == time_col) { fs[0] = fstart; fl[0] = q - fstart; }
        if (col == task_col) { fs[1] = fstart; fl[1] = q - fstart; }
        if (col == value_col) { fs[2] = fstart; fl[2] = q - fstart; }
        if (col == subject_col) { fs[3] = fstart; fl[3] = q - fstart; }
        ++col;
        fstart = q + 1;
        if (q == le) break;
      }
    }
    if (col <= max_col || !fs[0] || !fs[1] || !fs[2] ||
        (subject_col >= 0 && !fs[3])) {
      bad = true;
      break;
    }
    // numeric fields: strtod on a bounded copy (fields are short).  Any row
    // strtod would treat differently from Python float() — '_' separators,
    // hex floats, locale decimal points, non-finite values, overlong
    // fields — sends the WHOLE file to the Python fallback, which either
    // loads it or raises the canonical error with row context.
    char numbuf[64];
    double parsed[2];
    bool ok = true;
    const char *nf[2] = {fs[0], fs[2]};
    int64_t nl[2] = {fl[0], fl[2]};
    for (int k = 0; k < 2 && ok; ++k) {
      if (nl[k] == 0 || nl[k] >= static_cast<int64_t>(sizeof(numbuf))) {
        ok = false;
        break;
      }
      for (int64_t i = 0; i < nl[k]; ++i) {
        char c = nf[k][i];
        if (c == '_' || c == 'x' || c == 'X' || c == ',') {
          ok = false;  // float() / strtod divergence territory
          break;
        }
      }
      if (!ok) break;
      std::memcpy(numbuf, nf[k], nl[k]);
      numbuf[nl[k]] = '\0';
      char *ep;
      parsed[k] = std::strtod(numbuf, &ep);
      while (*ep == ' ' || *ep == '\t') ++ep;
      if (ep == numbuf || *ep != '\0' || !std::isfinite(parsed[k])) ok = false;
    }
    if (!ok) {
      bad = true;
      break;
    }
    int32_t tc = tasks.intern(fs[1], fl[1]);
    int32_t sc = subject_col >= 0 ? subjects.intern(fs[3], fl[3]) : 0;
    if (tc < 0 || sc < 0) {
      bad = true;
      break;
    }
    times[n] = parsed[0];
    values[n] = parsed[1];
    task_codes[n] = tc;
    subj_codes[n] = sc;
    ++n;
    p = eol ? eol + 1 : end;
  }

  *task_arena_len = tasks.arena_len;
  *n_tasks = tasks.n_unique;
  *subj_arena_len = subjects.arena_len;
  *n_subjects = subject_col >= 0 ? subjects.n_unique : 1;
  free(buf);
  if (bad) return -1;
  return n;
}

}  // extern "C"
