/* Native FASTA-ish reference parser.
 *
 * Host-runtime data loader for the TPU alignment engine: parses a
 * reference file into (metadata, sequence) records with EXACTLY the
 * line semantics of the reference implementation's InOutOps.GetRefSeqs
 * (reference src/sw/InOutOps.java:100-169):
 *
 *   - a line whose bytes start with the delimiter begins a new record;
 *     the metadata line is stored raw (no trimming);
 *   - all other lines are sequence data, concatenated raw (newline
 *     terminators removed, interior bytes untouched);
 *   - a non-metadata line before any metadata line is an error (the
 *     Java reference NPEs; the Python wrapper raises ValueError).
 *
 * The Python line iterator tops out around ~90 MB/s; this parser is
 * limited by memcpy.  Results are returned as two byte blobs plus
 * offset arrays so the Python side makes exactly 2*n small allocations
 * (the record strings), not one per line.
 *
 * Line terminators: '\n' and '\r\n' (a lone '\r' also terminates, like
 * Python str.splitlines on classic Mac data).
 */

#include <stdlib.h>
#include <string.h>
#include <stdio.h>

/* Error codes (keep in sync with io/_native_io.py). */
#define SWTPU_OK 0
#define SWTPU_EOPEN 1
#define SWTPU_EEMPTY 2
#define SWTPU_ENOMETA 3
#define SWTPU_ENOMEM 4

void swtpu_free(void *p) { free(p); }

static int grow_offsets(long long **off, long long *cap, long long need) {
    if (need <= *cap) return 0;
    long long ncap = *cap ? *cap * 2 : 1024;
    while (ncap < need) ncap *= 2;
    long long *p = (long long *)realloc(*off, (size_t)ncap * sizeof(long long));
    if (!p) return -1;
    *off = p;
    *cap = ncap;
    return 0;
}

int swtpu_parse_ref(
    const char *path,
    const char *delim,
    char **seq_blob_out,
    long long **seq_off_out,
    char **meta_blob_out,
    long long **meta_off_out,
    long long *n_out)
{
    *seq_blob_out = NULL;
    *seq_off_out = NULL;
    *meta_blob_out = NULL;
    *meta_off_out = NULL;
    *n_out = 0;

    FILE *f = fopen(path, "rb");
    if (!f) return SWTPU_EOPEN;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return SWTPU_EOPEN; }
    long long size = ftell(f);
    if (size < 0) { fclose(f); return SWTPU_EOPEN; }
    rewind(f);
    if (size == 0) { fclose(f); return SWTPU_EEMPTY; }

    char *buf = (char *)malloc((size_t)size);
    if (!buf) { fclose(f); return SWTPU_ENOMEM; }
    if (fread(buf, 1, (size_t)size, f) != (size_t)size) {
        free(buf); fclose(f); return SWTPU_EOPEN;
    }
    fclose(f);

    /* Blobs can never exceed the file size (we only drop bytes). */
    char *seq_blob = (char *)malloc((size_t)size + 1);
    char *meta_blob = (char *)malloc((size_t)size + 1);
    long long *seq_off = NULL, *meta_off = NULL;
    long long off_cap = 0, moff_cap = 0;
    if (!seq_blob || !meta_blob ||
        grow_offsets(&seq_off, &off_cap, 1) ||
        grow_offsets(&meta_off, &moff_cap, 1)) {
        free(buf); free(seq_blob); free(meta_blob);
        free(seq_off); free(meta_off);
        return SWTPU_ENOMEM;
    }

    size_t dlen = strlen(delim);
    long long seq_len = 0, meta_len = 0, n = 0;
    seq_off[0] = 0;
    meta_off[0] = 0;

    long long pos = 0;
    int err = SWTPU_OK;
    while (pos < size) {
        /* Find end of line: nearest of '\n' / '\r' via vectorized
         * memchr (a byte-at-a-time scan halves total throughput). */
        long long eol;
        const char *nl = (const char *)memchr(
            buf + pos, '\n', (size_t)(size - pos));
        long long nl_lim = nl ? (long long)(nl - buf) : size;
        const char *cr = (const char *)memchr(
            buf + pos, '\r', (size_t)(nl_lim - pos));
        eol = cr ? (long long)(cr - buf) : nl_lim;
        long long llen = eol - pos;

        if ((size_t)llen >= dlen && dlen > 0 &&
            memcmp(buf + pos, delim, dlen) == 0) {
            /* Metadata line: close previous record, open a new one. */
            if (grow_offsets(&seq_off, &off_cap, n + 2) ||
                grow_offsets(&meta_off, &moff_cap, n + 2)) {
                err = SWTPU_ENOMEM;
                break;
            }
            memcpy(meta_blob + meta_len, buf + pos, (size_t)llen);
            meta_len += llen;
            n++;
            meta_off[n] = meta_len;
            seq_off[n] = seq_len; /* updated as sequence lines arrive */
        } else {
            if (n == 0) { err = SWTPU_ENOMETA; break; }
            memcpy(seq_blob + seq_len, buf + pos, (size_t)llen);
            seq_len += llen;
            seq_off[n] = seq_len;
        }

        /* Skip the terminator ('\r\n' counts as one). */
        pos = eol;
        if (pos < size && buf[pos] == '\r') pos++;
        if (pos < size && buf[pos] == '\n') pos++;
    }
    free(buf);
    if (err == SWTPU_OK && n == 0) err = SWTPU_ENOMETA;
    if (err != SWTPU_OK) {
        free(seq_blob); free(meta_blob); free(seq_off); free(meta_off);
        return err;
    }

    *seq_blob_out = seq_blob;
    *seq_off_out = seq_off;
    *meta_blob_out = meta_blob;
    *meta_off_out = meta_off;
    *n_out = n;
    return SWTPU_OK;
}
