/*
 * Test-only shim driving the REFERENCE hydrium entropy coder through its
 * internal API, so the Python reimplementation can be byte-compared
 * against it.  Compiled at test time with -I into /root/reference (the
 * reference tree is never copied into this repo).
 */
#include <stddef.h>
#include <stdint.h>
#include <string.h>

#include "bitwriter.h"
#include "entropy.h"

/* Encode a symbol stream with the prefix path; returns bytes written or <0. */
long shim_prefix(const uint8_t *cluster_map, size_t num_dists,
                 int custom_config, int split, int msb, int lsb,
                 uint32_t lz77_min_symbol, int modular,
                 const uint32_t *dists, const uint32_t *symbols, size_t n,
                 uint8_t *out, size_t out_cap) {
    HYDEntropyStream stream;
    HYDBitWriter bw;
    const char *error = NULL;
    HYDStatusCode ret;

    if (hyd_init_bit_writer(&bw, out, out_cap, 0, 0) < HYD_ERROR_START)
        return -100;
    bw.realloc_func = NULL;

    ret = hyd_entropy_init_stream(&stream, n ? n : 1, cluster_map, num_dists,
                                  custom_config, lz77_min_symbol, modular,
                                  &error);
    if (ret < HYD_ERROR_START)
        return -1;
    if (custom_config) {
        ret = hyd_entropy_set_hybrid_config(&stream, 0, 0, split, msb, lsb);
        if (ret < HYD_ERROR_START)
            return -2;
    }
    for (size_t i = 0; i < n; i++) {
        ret = hyd_entropy_send_symbol(&stream, dists[i], symbols[i]);
        if (ret < HYD_ERROR_START)
            return -3;
    }
    ret = hyd_prefix_finalize_stream(&stream, &bw);
    if (ret < HYD_ERROR_START)
        return -4;
    if (hyd_bitwriter_flush(&bw) < HYD_ERROR_START)
        return -5;
    return (long)bw.buffer_pos;
}

/* Encode a symbol stream with the ANS path; returns bytes written or <0. */
long shim_ans(const uint8_t *cluster_map, size_t num_dists,
              int custom_config, int split, int msb, int lsb,
              uint32_t lz77_min_symbol, int modular,
              const uint32_t *dists, const uint32_t *symbols, size_t n,
              uint8_t *out, size_t out_cap) {
    HYDEntropyStream stream;
    HYDBitWriter bw;
    const char *error = NULL;
    HYDStatusCode ret;

    if (hyd_init_bit_writer(&bw, out, out_cap, 0, 0) < HYD_ERROR_START)
        return -100;
    bw.realloc_func = NULL;

    ret = hyd_entropy_init_stream(&stream, n ? n : 1, cluster_map, num_dists,
                                  custom_config, lz77_min_symbol, modular,
                                  &error);
    if (ret < HYD_ERROR_START)
        return -1;
    if (custom_config) {
        ret = hyd_entropy_set_hybrid_config(&stream, 0, 0, split, msb, lsb);
        if (ret < HYD_ERROR_START)
            return -2;
    }
    for (size_t i = 0; i < n; i++) {
        ret = hyd_entropy_send_symbol(&stream, dists[i], symbols[i]);
        if (ret < HYD_ERROR_START)
            return -3;
    }
    ret = hyd_ans_finalize_stream(&stream, &bw);
    if (ret < HYD_ERROR_START)
        return -4;
    if (hyd_bitwriter_flush(&bw) < HYD_ERROR_START)
        return -5;
    return (long)bw.buffer_pos;
}
