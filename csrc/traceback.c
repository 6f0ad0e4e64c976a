/* Batched Smith-Waterman traceback walk.
 *
 * Native equivalent of the reference's GetAlignment backtrack
 * (src/sw/SmithWaterman.java:354-436) over a batch of start cells (the
 * per-max-cell parallel map of DistributedSW.GetAlignments,
 * src/sw/DistributedSW.java:432-494).  The DP fill runs on the TPU and
 * streams direction codes to the host; this walk is irreducibly
 * pointer-chasing, so it lives in C instead of Python (the Python
 * fallback in ops/traceback.py is the reference implementation).
 *
 * Direction codes (ops/recurrence.py contract):
 *   0 none (score 0 - stop), 1 align, 2 insertion, 3 deletion.
 */

#include <stdint.h>

/* Walk every start cell of one (read x ref) pair.
 *
 * dirs:     (m, n) row-major int8 effective direction codes
 * cells:    (k, 2) int32 0-based (i, j) start cells
 * ref/read: sequences (not NUL-terminated; lengths n, m)
 * gap:      gap character ('_')
 * ref_out/read_out: (k, m+n) byte buffers; alignment t occupies the
 *           LAST lens[t] bytes of row t (the walk emits right-to-left,
 *           which is also how the Java version pops its stack)
 * lens:     (k,) out - alignment lengths
 * begins:   (k,) out - 1-based ref column where the alignment begins
 */
void sw_traceback_batch(const int8_t *dirs, int32_t m, int32_t n,
                        const int32_t *cells, int32_t k,
                        const char *ref, const char *read, char gap,
                        char *ref_out, char *read_out,
                        int32_t *lens, int32_t *begins) {
  const int32_t cap = m + n;
  for (int32_t t = 0; t < k; ++t) {
    int32_t i = cells[2 * t] + 1; /* 1-based walk coordinates */
    int32_t j = cells[2 * t + 1] + 1;
    char *rrow = ref_out + (int64_t)t * cap;
    char *qrow = read_out + (int64_t)t * cap;
    int32_t pos = cap;
    int32_t beginning = 0;
    while (i > 0 && j > 0) {
      int8_t d = dirs[(int64_t)(i - 1) * n + (j - 1)];
      if (d == 0) break;
      beginning = j;
      --pos;
      if (d == 1) { /* align: consume both */
        rrow[pos] = ref[j - 1];
        qrow[pos] = read[i - 1];
        --i;
        --j;
      } else if (d == 2) { /* insertion: gap in ref */
        rrow[pos] = gap;
        qrow[pos] = read[i - 1];
        --i;
      } else { /* deletion: gap in read */
        rrow[pos] = ref[j - 1];
        qrow[pos] = gap;
        --j;
      }
    }
    lens[t] = cap - pos;
    begins[t] = beginning;
  }
}
