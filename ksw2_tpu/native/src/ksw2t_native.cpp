// Native host-side runtime for ksw2_tpu.
//
// The TPU kernels produce direction-byte matrices and score records; the
// host-side hot path (traceback walk, CIGAR run-length handling, sequence
// encoding, FASTA/FASTQ parsing) lives here.  Semantics mirror the
// reference's inline helpers (ksw2.h:113-207) and kseq.h record model; the
// Python fallbacks in ksw2_tpu.spec/io are the executable spec for this
// file and the test suite cross-checks the two.
//
// Plain C ABI (ctypes-consumed); all buffers caller-owned, no allocation.
//
// Attribution: k2t_backtrack and push_cigar are semantics-mandated state
// machines whose bit layout is fixed by the parity contract with lh3/ksw2
// (MIT license, Copyright (c) 2018 Dana-Farber Cancer Institute); their
// control flow follows ksw_backtrack/ksw_push_cigar (ksw2.h:113-161) with
// extensions (store_off, bounds checks).  Everything else in this file is
// original.

#include <cstdint>
#include <cstring>

extern "C" {

// --- CIGAR helpers ---------------------------------------------------------

// Append run-length op with merge; returns new count (<= cap guaranteed by
// caller sizing: n_ops <= qlen + tlen).
static inline int64_t push_cigar(uint32_t *cig, int64_t n, uint32_t op,
                                 uint32_t len) {
  if (n == 0 || (cig[n - 1] & 0xf) != op) {
    cig[n++] = len << 4 | op;
  } else {
    cig[n - 1] += len << 4;
  }
  return n;
}

// --- traceback over a recorded direction matrix ----------------------------
//
// Mirror of ksw_backtrack (ksw2.h:129-161) with two extensions used by the
// TPU layout: `store_off` (per-row storage offset; the kernels store rows at
// 128-aligned offsets) and bounds-checked reads (out-of-buffer reads return
// 0, matching the documented fresh-memory behavior of the reference).
int64_t k2t_backtrack(const uint8_t *p, int64_t p_size, const int32_t *off,
                      const int32_t *off_end, const int32_t *store_off,
                      int32_t n_col, int32_t i0, int32_t j0, int32_t is_rot,
                      int32_t is_rev, int32_t min_intron_len, uint32_t *out,
                      int64_t cap) {
  int64_t n = 0;
  int32_t i = i0, j = j0, state = 0;
  while (i >= 0 && j >= 0) {
    int force_state = -1;
    int64_t idx;
    int32_t r;
    if (is_rot) {
      r = i + j;
      if (i < off[r]) force_state = 2;
      if (off_end && i > off_end[r]) force_state = 1;
      idx = (int64_t)r * n_col + i - (store_off ? store_off[r] : off[r]);
    } else {
      if (j < off[i]) force_state = 2;
      if (off_end && j > off_end[i]) force_state = 1;
      idx = (int64_t)i * n_col + j - (store_off ? store_off[i] : off[i]);
    }
    uint32_t tmp = 0;
    if (force_state < 0 && idx >= 0 && idx < p_size) tmp = p[idx];
    if (state == 0)
      state = tmp & 7;
    else if (!((tmp >> (state + 2)) & 1))
      state = 0;
    if (state == 0) state = tmp & 7;
    if (force_state >= 0) state = force_state;
    if (n + 2 > cap) return -1;  // caller sized too small
    if (state == 0) {
      n = push_cigar(out, n, 0 /*M*/, 1);
      --i, --j;
    } else if (state == 1 || (state == 3 && min_intron_len <= 0)) {
      n = push_cigar(out, n, 2 /*D*/, 1);
      --i;
    } else if (state == 3 && min_intron_len > 0) {
      n = push_cigar(out, n, 3 /*N*/, 1);
      --i;
    } else {
      n = push_cigar(out, n, 1 /*I*/, 1);
      --j;
    }
  }
  if (i >= 0)
    n = push_cigar(out, n,
                   (min_intron_len > 0 && i >= min_intron_len) ? 3 : 2, i + 1);
  if (j >= 0) n = push_cigar(out, n, 1, j + 1);
  if (!is_rev) {
    for (int64_t k = 0; k < n >> 1; ++k) {
      uint32_t t = out[k];
      out[k] = out[n - 1 - k];
      out[n - 1 - k] = t;
    }
  }
  return n;
}

// --- M -> =/X rewrite (ksw_cigar2eqx, ksw2.h:163-182) -----------------------
int64_t k2t_cigar2eqx(const uint32_t *cig, int64_t n_in, const uint8_t *query,
                      const uint8_t *target, uint32_t *out, int64_t cap) {
  int64_t n = 0, x = 0, y = 0;
  for (int64_t k = 0; k < n_in; ++k) {
    uint32_t op = cig[k] & 0xf, len = cig[k] >> 4;
    if (op == 0) {  // M
      for (uint32_t i = 0; i < len; ++i) {
        if (n + 1 > cap) return -1;
        n = push_cigar(out, n, target[x + i] == query[y + i] ? 7 : 8, 1);
      }
      x += len, y += len;
    } else {
      if (n + 1 > cap) return -1;
      n = push_cigar(out, n, op, len);
      if (op == 2 || op == 3)
        x += len;
      else if (op == 1)
        y += len;
      else if (op == 7 || op == 8)
        x += len, y += len;
    }
  }
  return n;
}

// --- nt4 encoding (cli.c:17-34) ---------------------------------------------
static uint8_t NT4[256];
static int nt4_init_done = 0;
static void nt4_init() {
  if (nt4_init_done) return;
  memset(NT4, 4, 256);
  NT4['A'] = NT4['a'] = 0;
  NT4['C'] = NT4['c'] = 1;
  NT4['G'] = NT4['g'] = 2;
  NT4['T'] = NT4['t'] = 3;
  nt4_init_done = 1;
}

void k2t_encode_nt4(const char *s, int64_t n, uint8_t *out) {
  nt4_init();
  for (int64_t i = 0; i < n; ++i) out[i] = NT4[(uint8_t)s[i]];
}

// --- FASTA/FASTQ parser (kseq.h record model) --------------------------------
//
// Parses a whole (already-decompressed) buffer.  Sequences and quals are
// compacted (newlines stripped) into seq_out; per-record metadata goes into
// rec_meta as 8 int64 per record:
//   name_off, name_len (into buf), comment_off, comment_len (into buf),
//   seq_off, seq_len (into seq_out), qual_off, qual_len (into seq_out).
// Returns the record count, or -1 if a capacity is exceeded.
int64_t k2t_fastx_parse(const uint8_t *buf, int64_t n, uint8_t *seq_out,
                        int64_t seq_cap, int64_t *rec_meta, int64_t meta_cap) {
  int64_t i = 0, nrec = 0, sp = 0;
  while (i < n) {
    // find header
    while (i < n && buf[i] != '>' && buf[i] != '@') ++i;
    if (i >= n) break;
    int is_fq = buf[i] == '@';
    ++i;
    int64_t name_off = i;
    while (i < n && buf[i] != '\n' && buf[i] != ' ' && buf[i] != '\t' &&
           buf[i] != '\r')
      ++i;
    int64_t name_len = i - name_off;
    int64_t com_off = i, com_len = 0;
    if (i < n && buf[i] != '\n') {
      while (i < n && (buf[i] == ' ' || buf[i] == '\t')) ++i;
      com_off = i;
      while (i < n && buf[i] != '\n' && buf[i] != '\r') ++i;
      com_len = i - com_off;
    }
    while (i < n && buf[i] != '\n') ++i;
    ++i;  // past newline
    // sequence lines
    int64_t seq_off = sp;
    while (i < n && buf[i] != '>' && buf[i] != '+' &&
           (is_fq ? 1 : buf[i] != '@')) {
      if (buf[i] != '\n' && buf[i] != '\r') {
        if (sp >= seq_cap) return -1;
        seq_out[sp++] = buf[i];
      }
      ++i;
      if (!is_fq) continue;
      // FASTQ: '@' can start a quality line only after '+'; stop seq at '+'
    }
    int64_t seq_len = sp - seq_off;
    int64_t qual_off = sp, qual_len = 0;
    if (is_fq && i < n && buf[i] == '+') {
      while (i < n && buf[i] != '\n') ++i;  // skip '+' line
      ++i;
      while (i < n && qual_len < seq_len) {
        if (buf[i] != '\n' && buf[i] != '\r') {
          if (sp >= seq_cap) return -1;
          seq_out[sp++] = buf[i];
          ++qual_len;
        }
        ++i;
      }
      while (i < n && buf[i] != '\n') ++i;  // to end of last qual line
    }
    if (nrec * 8 + 8 > meta_cap) return -1;
    int64_t *m = rec_meta + nrec * 8;
    m[0] = name_off;
    m[1] = name_len;
    m[2] = com_off;
    m[3] = com_len;
    m[4] = seq_off;
    m[5] = seq_len;
    m[6] = qual_off;
    m[7] = qual_len;
    ++nrec;
  }
  return nrec;
}

// --- version ----------------------------------------------------------------
int32_t k2t_abi_version() { return 1; }

}  // extern "C"
