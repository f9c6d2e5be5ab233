// Native OpenEXR scanline codec (capability ref: the reference links
// OpenEXR via OIIO — render/image_oiio.cpp and the session EXR writers;
// independent implementation of the public OpenEXR 2.0 format spec).
//
// Replaces the pure-Python codec in utils/exr.py on the hot path
// (measured: 1.65 s write / 2.4 s read for a 1024^2 RGBA float frame in
// Python — this codec is memcpy-speed) and adds ZIP/ZIPS compression
// (zlib + the spec's reorder/predictor transform), so real-world
// compressed EXRs read too. The Python codec stays as the portable
// fallback and parity twin.
//
// Exposed C ABI (ctypes, see native/__init__.py):
//   rtp_exr_write(path, w, h, n_ch, names, data(n_ch,h,w), half, comp)
//   rtp_exr_info(path, &w, &h, &n_ch, names_buf, cap)
//   rtp_exr_read(path, out(n_ch,h,w))
// Channels are written/read in ALPHABETICAL order (spec requirement);
// the Python wrapper sorts names before calling.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint32_t kMagic = 0x01312f76;
constexpr int kPtHalf = 1;
constexpr int kPtFloat = 2;
constexpr int kCompNone = 0;
constexpr int kCompZips = 2;  // 1 scanline / chunk
constexpr int kCompZip = 3;   // 16 scanlines / chunk

// ---- half <-> float (spec conversions, round-to-nearest-even) ----
uint16_t float_to_half(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xff) - 127 + 15;
  uint32_t man = x & 0x7fffffu;
  if (((x >> 23) & 0xff) == 0xff) {  // inf/nan
    return (uint16_t)(sign | 0x7c00u | (man ? 0x200u : 0u));
  }
  if (exp >= 31) return (uint16_t)(sign | 0x7c00u);  // overflow -> inf
  if (exp <= 0) {                                    // subnormal half
    if (exp < -10) return (uint16_t)sign;
    man |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint32_t half = man >> shift;
    uint32_t rem = man & ((1u << shift) - 1u);
    uint32_t mid = 1u << (shift - 1);
    if (rem > mid || (rem == mid && (half & 1u))) half++;
    return (uint16_t)(sign | half);
  }
  uint32_t half = (uint32_t)(exp << 10) | (man >> 13);
  uint32_t rem = man & 0x1fffu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1u))) half++;
  return (uint16_t)(sign | half);
}

float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1fu;
  uint32_t man = h & 0x3ffu;
  uint32_t x;
  if (exp == 0) {
    if (man == 0) {
      x = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400u)) {
        man <<= 1;
        exp--;
      }
      man &= 0x3ffu;
      x = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    x = sign | 0x7f800000u | (man << 13);
  } else {
    x = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &x, 4);
  return f;
}

// ---- the spec's zip pre/post transform (ImfZip semantics):
// compression applies delta-encode then byte-plane interleave split;
// decompression inverts. ----
void zip_reorder_encode(const uint8_t* src, uint8_t* dst, size_t n) {
  // split even/odd bytes into two planes, THEN delta-predict the
  // split buffer in place (ImfZip.cpp order: reorder, then predictor)
  size_t half = (n + 1) / 2;
  size_t a = 0, b = half, i = 0;
  while (true) {
    if (i < n) dst[a++] = src[i++]; else break;
    if (i < n) dst[b++] = src[i++]; else break;
  }
  int prev = n ? dst[0] : 0;
  for (size_t j = 1; j < n; j++) {
    int d = (int)dst[j] - prev + (128 + 256);
    prev = dst[j];
    dst[j] = (uint8_t)d;
  }
}

void zip_reorder_decode(uint8_t* buf, uint8_t* out, size_t n) {
  // un-predictor in place, then re-interleave the two planes
  for (size_t i = 1; i < n; i++) {
    int d = (int)buf[i - 1] + (int)buf[i] - 128;
    buf[i] = (uint8_t)d;
  }
  const uint8_t* t1 = buf;
  const uint8_t* t2 = buf + (n + 1) / 2;
  size_t i = 0;
  while (true) {
    if (i < n) out[i++] = *t1++; else break;
    if (i < n) out[i++] = *t2++; else break;
  }
}

void put_u32(std::string& s, uint32_t v) { s.append((const char*)&v, 4); }
void put_i32(std::string& s, int32_t v) { s.append((const char*)&v, 4); }
void put_u64(std::string& s, uint64_t v) { s.append((const char*)&v, 8); }
void put_f32(std::string& s, float v) { s.append((const char*)&v, 4); }

void put_attr(std::string& s, const char* name, const char* type,
              const std::string& data) {
  s.append(name);
  s.push_back('\0');
  s.append(type);
  s.push_back('\0');
  put_u32(s, (uint32_t)data.size());
  s.append(data);
}

}  // namespace

extern "C" {

// data: (n_ch, h, w) float32, channel order = caller's order (the
// wrapper sorts alphabetically). half: store HALF. compression: 0
// none, 3 zip (16-line chunks).
int rtp_exr_write(const char* path, int w, int h, int n_ch,
                  const char* names, const float* data, int half,
                  int compression) {
  if (w <= 0 || h <= 0 || n_ch <= 0) return 1;
  if (compression != kCompNone && compression != kCompZip &&
      compression != kCompZips)
    return 2;
  const char* p = names;
  std::vector<std::string> ch(n_ch);
  for (int i = 0; i < n_ch; i++) {
    ch[i] = p;
    p += ch[i].size() + 1;
  }
  int psize = half ? 2 : 4;
  int ptype = half ? kPtHalf : kPtFloat;

  std::string chlist;
  for (int i = 0; i < n_ch; i++) {
    chlist.append(ch[i]);
    chlist.push_back('\0');
    put_i32(chlist, ptype);
    put_u32(chlist, 0);  // pLinear + reserved
    put_i32(chlist, 1);  // xSampling
    put_i32(chlist, 1);  // ySampling
  }
  chlist.push_back('\0');

  std::string hdr;
  put_attr(hdr, "channels", "chlist", chlist);
  std::string comp(1, (char)compression);
  put_attr(hdr, "compression", "compression", comp);
  std::string box;
  put_i32(box, 0);
  put_i32(box, 0);
  put_i32(box, w - 1);
  put_i32(box, h - 1);
  put_attr(hdr, "dataWindow", "box2i", box);
  put_attr(hdr, "displayWindow", "box2i", box);
  put_attr(hdr, "lineOrder", "lineOrder", std::string(1, '\0'));
  std::string f1;
  put_f32(f1, 1.0f);
  put_attr(hdr, "pixelAspectRatio", "float", f1);
  std::string v2;
  put_f32(v2, 0.0f);
  put_f32(v2, 0.0f);
  put_attr(hdr, "screenWindowCenter", "v2f", v2);
  put_attr(hdr, "screenWindowWidth", "float", f1);
  hdr.push_back('\0');

  int lines_per_chunk =
      compression == kCompZip ? 16 : 1;
  int n_chunks = (h + lines_per_chunk - 1) / lines_per_chunk;
  size_t line_bytes = (size_t)w * psize * n_ch;

  // build chunks
  std::vector<std::string> chunks(n_chunks);
  std::vector<uint8_t> raw;
  std::vector<uint8_t> reord;
  std::vector<uint8_t> zbuf;
  for (int ci = 0; ci < n_chunks; ci++) {
    int y0 = ci * lines_per_chunk;
    int ny = (y0 + lines_per_chunk > h) ? h - y0 : lines_per_chunk;
    raw.resize(line_bytes * ny);
    uint8_t* q = raw.data();
    for (int dy = 0; dy < ny; dy++) {
      int y = y0 + dy;
      for (int c = 0; c < n_ch; c++) {
        const float* src = data + ((size_t)c * h + y) * w;
        if (half) {
          uint16_t* qh = (uint16_t*)q;
          for (int x = 0; x < w; x++) qh[x] = float_to_half(src[x]);
        } else {
          std::memcpy(q, src, (size_t)w * 4);
        }
        q += (size_t)w * psize;
      }
    }
    std::string& out = chunks[ci];
    put_i32(out, y0);
    if (compression == kCompNone) {
      put_u32(out, (uint32_t)raw.size());
      out.append((const char*)raw.data(), raw.size());
    } else {
      reord.resize(raw.size());
      zip_reorder_encode(raw.data(), reord.data(), raw.size());
      uLongf zl = compressBound((uLong)reord.size());
      zbuf.resize(zl);
      if (compress2(zbuf.data(), &zl, reord.data(), (uLong)reord.size(),
                    Z_DEFAULT_COMPRESSION) != Z_OK)
        return 3;
      // spec: if compression doesn't shrink, store raw
      if (zl >= raw.size()) {
        put_u32(out, (uint32_t)raw.size());
        out.append((const char*)raw.data(), raw.size());
      } else {
        put_u32(out, (uint32_t)zl);
        out.append((const char*)zbuf.data(), zl);
      }
    }
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return 4;
  std::string head;
  put_u32(head, kMagic);
  put_u32(head, 2);  // version
  head.append(hdr);
  uint64_t off = head.size() + 8ull * n_chunks;
  std::string table;
  for (int ci = 0; ci < n_chunks; ci++) {
    put_u64(table, off);
    off += chunks[ci].size();
  }
  bool ok = std::fwrite(head.data(), 1, head.size(), f) == head.size() &&
            std::fwrite(table.data(), 1, table.size(), f) == table.size();
  for (int ci = 0; ok && ci < n_chunks; ci++)
    ok = std::fwrite(chunks[ci].data(), 1, chunks[ci].size(), f) ==
         chunks[ci].size();
  std::fclose(f);
  return ok ? 0 : 5;
}

namespace {

struct ExrInfo {
  int w = 0, h = 0;
  int compression = 0;
  int y_min = 0;
  std::vector<std::string> names;
  std::vector<int> ptypes;
  size_t table_pos = 0;  // offset-table position in file
  std::vector<uint8_t> buf;
};

int parse_exr(const char* path, ExrInfo& info) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 16) {
    std::fclose(f);
    return 2;
  }
  info.buf.resize(sz);
  if (std::fread(info.buf.data(), 1, sz, f) != (size_t)sz) {
    std::fclose(f);
    return 3;
  }
  std::fclose(f);
  const uint8_t* b = info.buf.data();
  const size_t n = info.buf.size();
  uint32_t magic, version;
  std::memcpy(&magic, b, 4);
  std::memcpy(&version, b + 4, 4);
  if (magic != kMagic) return 4;
  // tiled (0x200), deep (0x800), multi-part (0x1000): outside this
  // codec's subset — signal "fall back to the Python reader"
  if (version & (0x200u | 0x800u | 0x1000u)) return 5;

  // every read below is bounds-checked: a truncated/corrupt file must
  // fail cleanly, never overread the buffer
  auto read_str = [&](size_t& pos, std::string& out) -> bool {
    const void* e = std::memchr(b + pos, 0, n - pos);
    if (!e) return false;
    out.assign((const char*)b + pos);
    pos += out.size() + 1;
    return true;
  };

  size_t pos = 8;
  bool got_ch = false, got_dw = false;
  while (pos < n && b[pos] != 0) {
    std::string name, type;
    if (!read_str(pos, name) || pos >= n || !read_str(pos, type))
      return 16;
    if (pos + 4 > n) return 16;
    uint32_t asize;
    std::memcpy(&asize, b + pos, 4);
    pos += 4;
    if (pos + (size_t)asize > n) return 16;
    const uint8_t* ad = b + pos;
    if (name == "channels") {
      size_t cp = 0;
      while (cp < asize && ad[cp] != 0) {
        const void* e = std::memchr(ad + cp, 0, asize - cp);
        if (!e) return 16;
        std::string cn((const char*)ad + cp);
        cp += cn.size() + 1;
        if (cp + 16 > asize) return 16;
        int32_t pt;
        std::memcpy(&pt, ad + cp, 4);
        int32_t xs, ys;
        std::memcpy(&xs, ad + cp + 8, 4);
        std::memcpy(&ys, ad + cp + 12, 4);
        cp += 16;
        if (pt != kPtHalf && pt != kPtFloat) return 6;  // uint unsupported
        if (xs != 1 || ys != 1) return 7;               // subsampling
        info.names.push_back(cn);
        info.ptypes.push_back(pt);
      }
      got_ch = true;
    } else if (name == "compression") {
      if (asize < 1) return 16;
      info.compression = ad[0];
    } else if (name == "dataWindow") {
      if (asize < 16) return 16;
      int32_t v[4];
      std::memcpy(v, ad, 16);
      if (v[2] < v[0] || v[3] < v[1]) return 16;
      info.y_min = v[1];
      info.w = v[2] - v[0] + 1;
      info.h = v[3] - v[1] + 1;
      got_dw = true;
    }
    pos += asize;
  }
  if (pos >= n || !got_ch || !got_dw || info.names.empty()) return 8;
  info.table_pos = pos + 1;
  if (info.compression != kCompNone && info.compression != kCompZip &&
      info.compression != kCompZips)
    return 9;
  int lines_per_chunk = info.compression == kCompZip ? 16 : 1;
  size_t n_chunks =
      ((size_t)info.h + lines_per_chunk - 1) / lines_per_chunk;
  if (info.table_pos + 8 * n_chunks > n) return 16;  // truncated table
  return 0;
}

}  // namespace

// names_buf receives nul-separated channel names (in-file alphabetical
// order); returns 0 ok, negative if cap too small (|ret| = needed).
int rtp_exr_info(const char* path, int* w, int* h, int* n_ch,
                 char* names_buf, int cap) {
  ExrInfo info;
  int rc = parse_exr(path, info);
  if (rc) return rc;
  *w = info.w;
  *h = info.h;
  *n_ch = (int)info.names.size();
  size_t need = 0;
  for (auto& n : info.names) need += n.size() + 1;
  if ((size_t)cap < need) return -(int)need;
  char* q = names_buf;
  for (auto& n : info.names) {
    std::memcpy(q, n.c_str(), n.size() + 1);
    q += n.size() + 1;
  }
  return 0;
}

// out: (n_ch, h, w) float32 in in-file channel order.
int rtp_exr_read(const char* path, float* out) {
  ExrInfo info;
  int rc = parse_exr(path, info);
  if (rc) return rc;
  const uint8_t* b = info.buf.data();
  int n_ch = (int)info.names.size();
  int lines_per_chunk = info.compression == kCompZip ? 16 : 1;
  int n_chunks = (info.h + lines_per_chunk - 1) / lines_per_chunk;
  size_t psize_total = 0;
  for (int c = 0; c < n_ch; c++)
    psize_total += (info.ptypes[c] == kPtHalf ? 2 : 4);
  size_t line_bytes = (size_t)info.w * psize_total;

  std::vector<uint8_t> zraw, raw;
  for (int ci = 0; ci < n_chunks; ci++) {
    uint64_t off;
    std::memcpy(&off, b + info.table_pos + 8ull * ci, 8);
    if (off + 8 > info.buf.size()) return 10;
    int32_t y;
    uint32_t nbytes;
    std::memcpy(&y, b + off, 4);
    std::memcpy(&nbytes, b + off + 4, 4);
    if (off + 8 + nbytes > info.buf.size()) return 11;
    int y0 = y - info.y_min;
    int ny = (y0 + lines_per_chunk > info.h) ? info.h - y0
                                             : lines_per_chunk;
    size_t want = line_bytes * ny;
    const uint8_t* src = b + off + 8;
    if (info.compression == kCompNone || nbytes >= want) {
      if (nbytes != want) return 12;
      raw.assign(src, src + want);
    } else {
      zraw.resize(want);
      uLongf rl = (uLongf)want;
      if (uncompress(zraw.data(), &rl, src, nbytes) != Z_OK ||
          rl != want)
        return 13;
      raw.resize(want);
      zip_reorder_decode(zraw.data(), raw.data(), want);
    }
    const uint8_t* q = raw.data();
    for (int dy = 0; dy < ny; dy++) {
      int yy = y0 + dy;
      if (yy < 0 || yy >= info.h) return 14;
      for (int c = 0; c < n_ch; c++) {
        float* dst = out + ((size_t)c * info.h + yy) * info.w;
        if (info.ptypes[c] == kPtHalf) {
          const uint16_t* qh = (const uint16_t*)q;
          for (int x = 0; x < info.w; x++) dst[x] = half_to_float(qh[x]);
          q += (size_t)info.w * 2;
        } else {
          std::memcpy(dst, q, (size_t)info.w * 4);
          q += (size_t)info.w * 4;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
