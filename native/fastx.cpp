// Fast FASTQ batch parser: file bytes -> packed 2-bit code batch.
//
// Replaces the reference's line-by-line std::getline FASTQ loader
// (src/query.cpp:371-445) for the high-throughput query path.
//
// C ABI:
//   int64_t cammiq_parse_fastq(const char* buf, int64_t len,
//                              int8_t* codes, int32_t* lengths,
//                              int64_t max_reads, int32_t max_len,
//                              int32_t min_len, uint64_t seed);
// Returns the number of reads parsed.  codes is [max_reads, max_len]
// row-major, zero-padded; N/non-ACGT replaced with a cheap LCG random
// base (reference behavior: src/query.cpp:383).

#include <cstdint>
#include <cstring>

namespace {
static inline int8_t code_of(uint8_t c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}
}  // namespace

extern "C" {

int64_t cammiq_parse_fastq(const char* buf, int64_t len, int8_t* codes,
                           int32_t* lengths, int64_t max_reads,
                           int32_t max_len, int32_t min_len, uint64_t seed) {
  int64_t i = 0, r = 0;
  uint64_t st = seed | 1;
  auto next_line = [&](int64_t& start, int64_t& end) -> bool {
    if (i >= len) return false;
    start = i;
    while (i < len && buf[i] != '\n') ++i;
    end = i;
    if (end > start && buf[end - 1] == '\r') --end;
    if (i < len) ++i;  // skip newline
    return true;
  };
  int64_t s0, e0;
  while (r < max_reads && next_line(s0, e0)) {   // header
    int64_t sb, eb;
    if (!next_line(sb, eb)) break;               // bases
    next_line(s0, e0);                           // '+'
    next_line(s0, e0);                           // quals
    int64_t rl = eb - sb;
    if (rl < min_len || rl < 1) continue;
    if (rl > max_len) rl = max_len;
    int8_t* row = codes + r * (int64_t)max_len;
    memset(row, 0, max_len);
    for (int64_t k = 0; k < rl; ++k) {
      int8_t c = code_of((uint8_t)buf[sb + k]);
      if (c < 0) {
        st = st * 6364136223846793005ULL + 1442695040888963407ULL;
        c = (int8_t)((st >> 33) & 3);
      }
      row[k] = c;
    }
    lengths[r] = (int32_t)rl;
    ++r;
  }
  return r;
}

}  // extern "C"
