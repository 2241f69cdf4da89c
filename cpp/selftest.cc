// Standalone self-test of the native serialization plane, built under
// ASAN/UBSAN by `make asan` (SURVEY.md §5: sanitizer coverage for the
// host-native code).  Exercises every hot path with randomized streams:
// LZ77 tokenization, prefix encode (simple + complex codes, nested
// cluster maps), the packed-stream context walker, ANS table build and
// backwards emission (single- and multi-threaded).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
struct HydWriter;
struct HydStream;
struct HydHF;
HydWriter* hyd_writer_new();
void hyd_writer_free(HydWriter*);
long hyd_writer_bit_size(HydWriter*);
void hyd_writer_write(HydWriter*, uint64_t, int);
long hyd_writer_copy(HydWriter*, uint8_t*, long, uint32_t*, int*);
HydStream* hyd_stream_new(const uint8_t*, long, uint32_t, int, int, int, int,
                          int);
void hyd_stream_free(HydStream*);
void hyd_stream_send_mono(HydStream*, uint32_t, const uint32_t*, long);
int hyd_stream_prefix_finalize(HydStream*, HydWriter*);
HydHF* hyd_hf_new(long);
void hyd_hf_free(HydHF*);
void hyd_hf_add_group(HydHF*, const uint16_t*, const uint8_t*,
                      const uint32_t*, const uint8_t*, const int32_t*, long,
                      uint32_t);
int hyd_hf_add_lfg_packed(HydHF*, const uint32_t*, const uint32_t*,
                          const uint16_t*, int, const uint8_t*, uint32_t,
                          long, long, long, long, const int64_t*,
                          const int64_t*, const int64_t*, int);
int hyd_hf_prepare(HydHF*);
int hyd_hf_encode_all(HydHF*, int, HydWriter**, int);
int hyd_hf_write_header(HydHF*, const uint8_t*, long, HydWriter*);
void hyd_hf_force_las(HydHF*, int);
long hyd_lf_decode(const uint32_t*, const uint16_t*, long, long, uint32_t*);
long hyd_px_pack(const void*, long, long, int, uint8_t*, uint16_t*,
                 uint32_t*, long, int);
}

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint32_t rnd() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (uint32_t)(rng_state >> 32);
}

static void test_prefix_streams() {
  for (int iter = 0; iter < 20; iter++) {
    uint8_t cm[1] = {0};
    HydStream* s = hyd_stream_new(cm, 1, (iter & 1) ? (1u << 14) : 0,
                                  iter & 1, 1, 7, 1, 1);
    std::vector<uint32_t> syms(1 + rnd() % 5000);
    for (auto& v : syms) {
      v = rnd() % ((iter % 3 == 0) ? 4u : 100000u);
      if (rnd() % 3 == 0 && &v != syms.data()) v = (&v)[-1];  // runs
    }
    hyd_stream_send_mono(s, 0, syms.data(), syms.size());
    HydWriter* w = hyd_writer_new();
    if (hyd_stream_prefix_finalize(s, w) != 0) {
      fprintf(stderr, "prefix finalize failed\n");
      exit(1);
    }
    hyd_writer_free(w);
    hyd_stream_free(s);
  }
  printf("prefix streams ok\n");
}

// build cluster map like tables.hf_cluster_map(1)
static std::vector<uint8_t> hf_map() {
  std::vector<uint8_t> cm(1485);
  for (int j = 0; j < 1485; j++)
    cm[j] = j < 111 ? j % 3 : 3 + (j - 111) % 6;
  return cm;
}

static void test_hf_padded_and_packed() {
  auto cm = hf_map();
  const int blocks = 1024;
  std::vector<uint16_t> tokens(blocks * 3 * 64);
  std::vector<uint8_t> clusters(blocks * 3 * 64);
  std::vector<uint32_t> residues(blocks * 3 * 64);
  std::vector<uint8_t> rbits(blocks * 3 * 64);
  std::vector<int32_t> valid(blocks * 3);
  for (int b = 0; b < blocks * 3; b++) {
    valid[b] = rnd() % 65;
    for (int k = 0; k < 64; k++) {
      int i = b * 64 + k;
      tokens[i] = rnd() % 40;
      clusters[i] = cm[rnd() % 1485];
      rbits[i] = tokens[i] >= 16 ? ((tokens[i] - 16) >> 1) + 3 : 0;
      residues[i] = rbits[i] ? (rnd() & ((1u << rbits[i]) - 1)) : 0;
    }
  }
  HydHF* h = hyd_hf_new(9);
  for (int g = 0; g < 8; g++)
    hyd_hf_add_group(h, tokens.data(), clusters.data(), residues.data(),
                     rbits.data(), valid.data(), blocks, 0);
  if (hyd_hf_prepare(h) != 0) {
    fprintf(stderr, "prepare failed\n");
    exit(1);
  }
  std::vector<HydWriter*> ws(8);
  for (auto& w : ws) w = hyd_writer_new();
  if (hyd_hf_encode_all(h, 0, ws.data(), 4) != 0) {
    fprintf(stderr, "encode_all failed\n");
    exit(1);
  }
  HydWriter* hw = hyd_writer_new();
  if (hyd_hf_write_header(h, cm.data(), cm.size(), hw) != 0) {
    fprintf(stderr, "header failed\n");
    exit(1);
  }
  hyd_writer_free(hw);
  for (auto* w : ws) hyd_writer_free(w);
  hyd_hf_free(h);
  printf("hf padded ok\n");

  // packed walker (format v3): Huffman-coded tokens via a fixed-length
  // transport code (all symbols 6 bits, canonical LSB-first = reversed
  // 6-bit symbol) + residue bits; no valid-length sidecar -- the walker
  // reconstructs symbol counts from the decoded nonzero counts.  The
  // streams are word-aligned chunked: tokens realign every 64 block-
  // channels, residues every 32 (ops/pipeline.py format v3).
  auto rev6 = [](uint32_t v) {
    uint32_t r = 0;
    for (int i = 0; i < 6; i++) r |= ((v >> i) & 1) << (5 - i);
    return r;
  };
  // 9 classes, all using the same fixed 6-bit code (12-bit decode LUTs,
  // format v4: transport codes are <= 12 bits)
  std::vector<uint16_t> lut(9 * 4096);
  for (int k = 0; k < 9; k++)
    for (uint32_t idx = 0; idx < 4096; idx++)
      lut[k * 4096 + idx] = (uint16_t)(rev6(idx & 63) | (6 << 8));
  std::vector<uint32_t> tw, rw;
  uint64_t tcache = 0, rcache = 0;
  int tbits = 0, rbitsn = 0;
  auto put = [](std::vector<uint32_t>& out, uint64_t& cache, int& nbits,
                uint32_t v, int n) {
    cache |= (uint64_t)v << nbits;
    nbits += n;
    while (nbits >= 32) {
      out.push_back((uint32_t)cache);
      cache >>= 32;
      nbits -= 32;
    }
  };
  int64_t total_syms = 0;
  for (int b = 0; b < blocks * 3; b++) {
    // format v3 chunk alignment (pad-to-word on chunk entry)
    if (b % 64 == 0 && tbits) put(tw, tcache, tbits, 0, 32 - tbits);
    if (b % 32 == 0 && rbitsn) put(rw, rcache, rbitsn, 0, 32 - rbitsn);
    int nz = rnd() % 15;
    uint32_t count = nz;
    uint32_t ctok = count < 16 ? count : 16 + ((31 - __builtin_clz(count)) - 1 - 3) * 2 + ((count >> ((31 - __builtin_clz(count)) - 1)) & 1);
    int crb = ctok < 16 ? 0 : (int)((ctok - 16) >> 1) + 3;
    put(tw, tcache, tbits, rev6(ctok), 6);
    if (crb) put(rw, rcache, rbitsn, count & ((1u << crb) - 1), crb);
    total_syms++;
    // coefficients: emit nz nonzero tokens then stop
    for (int k = 0; k < nz; k++) {
      uint32_t tok = 2 + rnd() % 10;
      put(tw, tcache, tbits, rev6(tok), 6);
      total_syms++;
    }
  }
  put(tw, tcache, tbits, 0, 31);  // flush
  put(rw, rcache, rbitsn, 0, 31);
  tw.push_back(0); rw.push_back(0);
  tw.push_back(0); rw.push_back(0);
  HydHF* h2 = hyd_hf_new(9);
  hyd_hf_force_las(h2, 8);
  int64_t toff[1] = {0}, roff[1] = {0}, scount[1] = {total_syms};
  if (hyd_hf_add_lfg_packed(h2, tw.data(), rw.data(), lut.data(), 9,
                            cm.data(), 0, 1, 1, 32, 32, toff, roff, scount,
                            2) != 0) {
    fprintf(stderr, "packed walk failed\n");
    exit(1);
  }
  if (hyd_hf_prepare(h2) != 0) {
    fprintf(stderr, "packed prepare failed\n");
    exit(1);
  }
  HydWriter* w2 = hyd_writer_new();
  HydWriter* warr[1] = {w2};
  if (hyd_hf_encode_all(h2, 0, warr, 2) != 0) {
    fprintf(stderr, "packed encode failed\n");
    exit(1);
  }
  hyd_writer_free(w2);
  hyd_hf_free(h2);
  printf("hf packed ok\n");
}

// Format-v4 LF residual stream: hybrid-uint-tokenized fields under one
// fixed 6-bit transport code; hyd_lf_decode must reconstruct the exact
// pack_signed values and land on the exact bit count.
static void test_lf_decode() {
  auto rev6 = [](uint32_t v) {
    uint32_t r = 0;
    for (int i = 0; i < 6; i++) r |= ((v >> i) & 1) << (5 - i);
    return r;
  };
  std::vector<uint16_t> lut(4096);
  for (uint32_t idx = 0; idx < 4096; idx++)
    lut[idx] = (uint16_t)(rev6(idx & 63) | (6 << 8));
  const long n = 5000;
  std::vector<uint32_t> vals(n), lfw;
  uint64_t cache = 0;
  int nbits = 0;
  long total = 0;
  for (long i = 0; i < n; i++) {
    uint32_t v = rnd() % ((i % 7 == 0) ? (1u << 20) : 16u);
    vals[i] = v;
    uint32_t tok, res;
    int rb;
    if (v < 16) {
      tok = v; res = 0; rb = 0;
    } else {
      int fl = 31 - __builtin_clz(v);
      rb = fl - 1;
      tok = 16 + (((uint32_t)(rb - 3) << 1) | ((v >> rb) & 1));
      res = v & ((1u << rb) - 1);
    }
    cache |= (uint64_t)rev6(tok) << nbits;
    nbits += 6;
    cache |= (uint64_t)res << nbits;
    nbits += rb;
    total += 6 + rb;
    while (nbits >= 32) {
      lfw.push_back((uint32_t)cache);
      cache >>= 32;
      nbits -= 32;
    }
  }
  if (nbits) lfw.push_back((uint32_t)cache);
  lfw.push_back(0);
  lfw.push_back(0);
  std::vector<uint32_t> out(n);
  long end = hyd_lf_decode(lfw.data(), lut.data(), n, total, out.data());
  if (end != total) {
    fprintf(stderr, "lf decode end %ld != %ld\n", end, total);
    exit(1);
  }
  for (long i = 0; i < n; i++)
    if (out[i] != vals[i]) {
      fprintf(stderr, "lf decode mismatch at %ld: %u != %u\n", i, out[i],
              vals[i]);
      exit(1);
    }
  printf("lf decode ok\n");

  // Corrupt streams must return -1 WITHOUT reading past the buffer's
  // one slack word (ADVICE r3: the old between-fields-only guard let a
  // mid-field advance dereference past the fetched words; ASAN verifies
  // the exact-size allocations here).
  {
    // every LUT entry: token 62 (rb = 26), code length 6 -> each field
    // is exactly 32 bits
    std::vector<uint16_t> lut62(4096, (uint16_t)(62 | (6 << 8)));
    // exactly 1 payload word + 1 slack word; claim 2 fields in 32 bits:
    // field 1 consumes all of max_bits, field 2 starts AT max_bits (the
    // old `>` check admitted it and peek12 read words[2])
    std::vector<uint32_t> tight{0x5A5A5A5Au, 0u};
    uint32_t o2[2] = {0, 0};
    if (hyd_lf_decode(tight.data(), lut62.data(), 2, 32, o2) != -1) {
      fprintf(stderr, "lf decode: field at max_bits not rejected\n");
      exit(1);
    }
    // mid-field overrun: max_bits 20 but the first field needs 32 bits
    // (code 6 + residue 26) -- must reject BEFORE read() runs off
    std::vector<uint32_t> tiny{0x12345678u, 0u};
    if (hyd_lf_decode(tiny.data(), lut62.data(), 1, 20, o2) != -1) {
      fprintf(stderr, "lf decode: mid-field overrun not rejected\n");
      exit(1);
    }
  }
  printf("lf decode corrupt ok\n");
}

static void test_px_pack() {
  // PXPACK v1 (hyd_px_pack): pack u8 and u16 buffers with mixed smooth/
  // noisy/constant regions, then roundtrip with a straight-line unpack
  // of the documented format (bit planes; raw = base+v, delta =
  // base+cumsum(unzigzag)).  Exercises both passes + threading under
  // ASAN/UBSAN.
  const long H = 70, W = 96;  // W % 32 == 0
  for (int is16 = 0; is16 < 2; is16++) {
    std::vector<uint16_t> img16(H * W * 3);
    std::vector<uint8_t> img8(H * W * 3);
    const int maxv = is16 ? 65535 : 255;
    for (long y = 0; y < H; y++)
      for (long x = 0; x < W; x++)
        for (long c = 0; c < 3; c++) {
          long v;
          if (y < H / 3)
            v = (x * 3 + y + c * 7) % (maxv + 1);  // gradient
          else if (y < 2 * H / 3)
            v = rnd() % (maxv + 1);  // noise
          else
            v = 1234 % (maxv + 1);  // constant
          img16[(y * W + x) * 3 + c] = (uint16_t)v;
          img8[(y * W + x) * 3 + c] = (uint8_t)v;
        }
    const long nb = 3 * H * (W >> 5);
    std::vector<uint8_t> hdr(nb);
    std::vector<uint16_t> base(nb);
    std::vector<uint32_t> words(nb * 16 + 1);
    long n = hyd_px_pack(is16 ? (const void*)img16.data()
                              : (const void*)img8.data(),
                         H, W, is16, hdr.data(), base.data(), words.data(),
                         (long)words.size(), 3);
    if (n < 0) {
      fprintf(stderr, "px pack overflow is16=%d\n", is16);
      exit(1);
    }
    long off = 0;
    for (long b = 0; b < nb; b++) {
      const long c = b / (H * (W >> 5));
      const long y = (b / (W >> 5)) % H;
      const long x0 = (b % (W >> 5)) << 5;
      const int width = hdr[b] & 31;
      int prev = base[b];
      for (int k = 0; k < 32; k++) {
        uint32_t v = 0;
        for (int j = 0; j < width; j++)
          v |= ((words[off + j] >> k) & 1u) << j;
        int px;
        if (hdr[b] & 0x80) {
          int d = (int)(v >> 1);
          if (v & 1) d = -d - 1;
          px = prev + d;
          prev = px;
        } else {
          px = (int)base[b] + (int)v;
        }
        const long i = (y * W + x0 + k) * 3 + c;
        const int want = is16 ? img16[i] : img8[i];
        if (px != want) {
          fprintf(stderr, "px pack mismatch b=%ld k=%d: %d != %d\n", b, k,
                  px, want);
          exit(1);
        }
      }
      off += width;
    }
    if (off != n) {
      fprintf(stderr, "px pack word count %ld != %ld\n", off, n);
      exit(1);
    }
  }
  printf("px pack ok\n");
}

int main() {
  test_prefix_streams();
  test_hf_padded_and_packed();
  test_lf_decode();
  test_px_pack();
  printf("selftest passed\n");
  return 0;
}
