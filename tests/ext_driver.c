// API-level driver for flags the reference CLI cannot express
// (KSW_EZ_EXTZ_ONLY, end_bonus, KSW_EZ_REV_CIGAR): prints the full ez
// record so the python suite has a real oracle for the extension-call
// pattern minimap2 uses.  Links against the unmodified reference objects.
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ksw2.h"

static unsigned char nt4(char c) {
  switch (c) { case 'A': return 0; case 'C': return 1; case 'G': return 2;
               case 'T': return 3; default: return 4; }
}

int main(int argc, char **argv) {
  // argv: algo q e q2 e2 w zdrop end_bonus flag qseq tseq [junc_hex]
  // (for exts2_sse: e2 is reused as noncan, end_bonus as junc_bonus,
  //  w ignored; junc_hex is one hex digit per target base)
  if (argc != 12 && argc != 13) { fprintf(stderr, "args\n"); return 2; }
  const char *algo = argv[1];
  int q = atoi(argv[2]), e = atoi(argv[3]), q2 = atoi(argv[4]),
      e2 = atoi(argv[5]), w = atoi(argv[6]), zdrop = atoi(argv[7]),
      end_bonus = atoi(argv[8]), flag = atoi(argv[9]);
  const char *qs = argv[10], *ts = argv[11];
  int qlen = strlen(qs), tlen = strlen(ts);
  uint8_t *qb = malloc(qlen), *tb = malloc(tlen);
  int i;
  for (i = 0; i < qlen; ++i) qb[i] = nt4(qs[i]);
  for (i = 0; i < tlen; ++i) tb[i] = nt4(ts[i]);
  int8_t mat[25];
  {  // simple 5x5 matrix, last row/col 0 (mirrors cli.c:36-48)
    int j, k;
    for (j = 0; j < 5; ++j)
      for (k = 0; k < 5; ++k)
        mat[j * 5 + k] = (j == 4 || k == 4) ? 0 : (j == k ? 2 : -4);
  }
  ksw_extz_t ez;
  memset(&ez, 0, sizeof(ez));
  if (strcmp(algo, "extz2_sse") == 0)
    ksw_extz2_sse(0, qlen, qb, tlen, tb, 5, mat, q, e, w, zdrop,
                  end_bonus, flag, &ez);
  else if (strcmp(algo, "extd2_sse") == 0)
    ksw_extd2_sse(0, qlen, qb, tlen, tb, 5, mat, q, e, q2, e2, w, zdrop,
                  end_bonus, flag, &ez);
  else if (strcmp(algo, "exts2_sse") == 0) {
    uint8_t *junc = 0;
    if (argc == 13 && (int)strlen(argv[12]) == tlen) {
      junc = calloc(tlen, 1);
      for (i = 0; i < tlen; ++i) {
        char c = argv[12][i];
        junc[i] = c <= '9' ? c - '0' : c - 'a' + 10;
      }
    }
    ksw_exts2_sse(0, qlen, qb, tlen, tb, 5, mat, q, e, q2,
                  (int8_t)e2 /* noncan */, zdrop,
                  (int8_t)end_bonus /* junc_bonus */, flag, junc, &ez);
    free(junc);
  } else return 2;
  printf("%d %d %d %d %d %d %d %d %d %d\n", (int)ez.max, ez.zdropped,
         ez.max_q, ez.max_t, ez.mqe, ez.mqe_t, ez.mte, ez.mte_q, ez.score,
         ez.reach_end);
  for (i = 0; i < ez.n_cigar; ++i)
    printf("%u%c", ez.cigar[i] >> 4, "MIDN"[ez.cigar[i] & 0xf]);
  printf("\n");
  free(ez.cigar); free(qb); free(tb);
  return 0;
}
