/* kmerio: native host-side data loader for kmerset_tpu.
 *
 * The reference is a header-only C++ codebase whose IO + encode inner loops
 * run on the CPU (reference: lib/core/io.h, lib/core/kmer_counter.h:161-209
 * FASTA validation, lib/core/kmer_set_compact.h:230-336 2-bit pack/unpack).
 * This is the equivalent native layer for the TPU build: one pass over the
 * raw FASTA bytes producing the flat 2-bit-code array + fragment offsets
 * that feed the device pipeline, plus 2-bit pack/unpack for the compact
 * in-memory form.  Exposed via ctypes (no pybind11 in this image).
 *
 * Build: make -C native   (produces libkmerio.so)
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define CODE_SEP 254
#define CODE_BAD 255

static uint8_t LUT[256];
static int lut_ready = 0;

static void init_lut(void) {
    if (lut_ready) return;
    memset(LUT, CODE_BAD, 256);
    LUT['A'] = 0; LUT['C'] = 1; LUT['G'] = 2; LUT['T'] = 3;
    LUT['N'] = CODE_SEP;
    lut_ready = 1;
}

/* Parses FASTA text in buf[0..n): alternating '>' header lines and sequence
 * lines of A/C/G/T/N.  Writes base codes (0..3) of the sequence characters
 * to out_codes (caller-allocated, size >= n) and fragment end offsets
 * (cut at every 'N' and at every line end) to out_offsets (size >= n + 2).
 *
 * Returns the number of fragments written (offsets used = n_frag + 1,
 * out_offsets[0] == 0), or:
 *   -1  odd number of lines / header without sequence
 *   -2  line 2i is not a '>' header
 *   -3  invalid character in a sequence line
 */
long kmerio_parse_fasta(const char *buf, long n,
                        uint8_t *out_codes, int64_t *out_offsets) {
    init_lut();
    long pos = 0, n_codes = 0, n_frag = 0, line = 0;
    out_offsets[0] = 0;
    while (pos < n) {
        long eol = pos;
        while (eol < n && buf[eol] != '\n') eol++;
        if (line % 2 == 0) {
            if (eol == pos || buf[pos] != '>') return -2;
        } else {
            long frag_len = 0;
            for (long i = pos; i < eol; i++) {
                uint8_t c = LUT[(uint8_t)buf[i]];
                if (c == CODE_BAD) return -3;
                if (c == CODE_SEP) {
                    if (frag_len > 0) {
                        out_offsets[++n_frag] = n_codes;
                        frag_len = 0;
                    }
                } else {
                    out_codes[n_codes++] = c;
                    frag_len++;
                }
            }
            if (frag_len > 0) out_offsets[++n_frag] = n_codes;
        }
        line++;
        pos = eol + 1;
    }
    if (line % 2 != 0) return -1;
    return n_frag;
}

/* Encodes a run of A/C/G/T bytes to codes; returns 0 or -3 on invalid. */
long kmerio_encode(const char *buf, long n, uint8_t *out) {
    init_lut();
    for (long i = 0; i < n; i++) {
        uint8_t c = LUT[(uint8_t)buf[i]];
        if (c > 3) return -3;
        out[i] = c;
    }
    return 0;
}

/* 2-bit pack: 4 codes per byte, first code in the low bits
 * (density parity with the reference's vector<bool> form,
 * reference: kmer_set_compact.h:230-255). */
void kmerio_pack2(const uint8_t *codes, long n, uint8_t *out) {
    long nb = (n + 3) / 4;
    memset(out, 0, nb);
    for (long i = 0; i < n; i++)
        out[i >> 2] |= (uint8_t)(codes[i] << ((i & 3) * 2));
}

void kmerio_unpack2(const uint8_t *packed, long n, uint8_t *out) {
    for (long i = 0; i < n; i++)
        out[i] = (packed[i >> 2] >> ((i & 3) * 2)) & 3;
}

/* Decode codes back to ACGT bytes. */
void kmerio_decode(const uint8_t *codes, long n, char *out) {
    static const char B[4] = {'A', 'C', 'G', 'T'};
    for (long i = 0; i < n; i++) out[i] = B[codes[i]];
}
