// Native TFRecord + tf.train.Example column reader.
//
// The reference's Criteo dataloader delegates record IO and proto
// parsing to tf.data's C++ kernels (examples/ml_perf/dataloader.py:
// 135-200). Our pure-Python reader (keras_rs_tpu/data/tfrecord.py)
// parses ~5k records/s — a 400x bottleneck against the chip at real
// Criteo scale — so this is its drop-in native engine: one pass over a
// file extracts the requested feature columns of every record into one
// output byte buffer with offsets. Semantics mirror parse_example
// exactly (same protobuf subset):
//   kind 0: BytesList  -> ALL elements' raw bytes, concatenated
//           (the reference's file-batched Criteo schema stores
//           file_batch_size strings per feature, dataloader.py:150-181;
//           fixed-width elements reshape on the Python side)
//   kind 1: FloatList  -> packed little-endian f32
//   kind 2: Int64List  -> packed little-endian i64 (varints decoded)
//   kind -1: key missing in the record
//
// Two entry points:
//   tfrec_parse_file  — legacy two-pass API (sizing call + fill call).
//   tfrec_parse_file2 — single-pass API: caller supplies guessed
//       capacities (out_cap bytes, n_cap records); the call parses the
//       file ONCE, reporting exact needed sizes, and returns -2/-3 when
//       a guess was too small so the caller can retry exactly.
//       data/native_io.py learns the ratios from the first file of a
//       dataset and single-passes the rest — ~2x the two-pass rate.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libtfrecord_reader.so \
//            tfrecord_reader.cc   (done on demand by data/native_io.py)

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    // Fast path: single-byte varint (the common case for tags).
    if (p < end && !(*p & 0x80)) return *p++;
    uint64_t result = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      result |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return result;
      shift += 7;
      if (shift >= 64) break;
    }
    ok = false;
    return 0;
  }

  bool skip(size_t n) {
    if (static_cast<size_t>(end - p) < n) {
      ok = false;
      return false;
    }
    p += n;
    return true;
  }
};

struct Slice {
  const uint8_t* p = nullptr;
  size_t len = 0;
};

// Walks one message's fields; returns false at end or error.
bool next_field(Cursor& c, uint32_t* field, uint32_t* wire, Slice* val,
                uint64_t* varint_val) {
  if (c.p >= c.end || !c.ok) return false;
  uint64_t tag = c.varint();
  if (!c.ok) return false;
  *field = static_cast<uint32_t>(tag >> 3);
  *wire = static_cast<uint32_t>(tag & 7);
  switch (*wire) {
    case 0:
      *varint_val = c.varint();
      return c.ok;
    case 2: {
      uint64_t len = c.varint();
      if (!c.ok || static_cast<uint64_t>(c.end - c.p) < len) {
        c.ok = false;
        return false;
      }
      val->p = c.p;
      val->len = len;
      c.p += len;
      return true;
    }
    case 5:
      val->p = c.p;
      val->len = 4;
      return c.skip(4);
    case 1:
      val->p = c.p;
      val->len = 8;
      return c.skip(8);
    default:
      c.ok = false;
      return false;
  }
}

// Output sink writing straight into the caller's buffer. When the
// buffer is absent or full it keeps COUNTING (so `written` always ends
// as the exact needed size) but stops copying.
struct Out {
  uint8_t* buf;       // nullptr = sizing mode
  uint64_t cap = 0;
  uint64_t written = 0;

  inline void append(const void* src, size_t n) {
    if (buf && written + n <= cap) {
      std::memcpy(buf + written, src, n);
    }
    written += n;
  }
};

// Parses one Feature message; emits bytes into `out`, returns the kind.
int parse_feature(Slice feat, Out& out) {
  Cursor c{feat.p, feat.p + feat.len};
  uint32_t field, wire;
  Slice val;
  uint64_t vv;
  while (next_field(c, &field, &wire, &val, &vv)) {
    if (field == 1 && wire == 2) {  // BytesList
      // Tight element loop. The wire stream is [0x0A][len][bytes]
      // repeated (field 1, wire 2 is the only field BytesList defines);
      // at the file-batched Criteo shape this runs ~26x per logical
      // record and the generic next_field walk was 70% of the whole
      // parse (gprof) — inlining the tag test + length varint here is
      // a ~1.4x end-to-end parser speedup. Foreign fields fall back to
      // the generic skip.
      const uint8_t* q = val.p;
      const uint8_t* qend = q + val.len;
      while (q < qend) {
        if (*q != 0x0A) {
          Cursor el{q, qend};
          uint32_t f2, w2;
          Slice v2;
          uint64_t vv2;
          if (!next_field(el, &f2, &w2, &v2, &vv2)) break;
          q = el.p;
          continue;
        }
        ++q;
        uint64_t n = 0;
        if (q < qend && !(*q & 0x80)) {
          n = *q++;
        } else {
          int shift = 0;
          bool ok = false;
          while (q < qend && shift < 64) {
            uint8_t b = *q++;
            n |= static_cast<uint64_t>(b & 0x7F) << shift;
            if (!(b & 0x80)) {
              ok = true;
              break;
            }
            shift += 7;
          }
          if (!ok) break;
        }
        if (static_cast<uint64_t>(qend - q) < n) break;
        out.append(q, n);
        q += n;
      }
      return 0;
    }
    if (field == 2 && wire == 2) {  // FloatList
      Cursor fl{val.p, val.p + val.len};
      while (next_field(fl, &field, &wire, &val, &vv)) {
        if (field != 1) continue;
        if (wire == 2) {
          out.append(val.p, val.len);  // packed f32, already LE
        } else if (wire == 5) {
          out.append(val.p, 4);
        }
      }
      return 1;
    }
    if (field == 3 && wire == 2) {  // Int64List
      Cursor il{val.p, val.p + val.len};
      while (next_field(il, &field, &wire, &val, &vv)) {
        if (field != 1) continue;
        if (wire == 2) {  // packed varints
          Cursor pv{val.p, val.p + val.len};
          // Decode into a local block, bulk-append (the per-element
          // append was a measurable cost at Criteo label widths).
          int64_t tmp[512];
          size_t nt = 0;
          while (pv.p < pv.end && pv.ok) {
            tmp[nt++] = static_cast<int64_t>(pv.varint());
            if (nt == 512) {
              out.append(tmp, nt * 8);
              nt = 0;
            }
          }
          if (nt) out.append(tmp, nt * 8);
        } else if (wire == 0) {
          int64_t x = static_cast<int64_t>(vv);
          out.append(&x, 8);
        }
      }
      return 2;
    }
  }
  return -1;
}

// Key matcher: length gate first, then backwards memcmp (Criteo key
// names share long prefixes and differ in their digit suffix).
inline bool key_eq(const uint8_t* a, size_t alen, const char* b,
                   long blen) {
  if (static_cast<long>(alen) != blen) return false;
  const uint8_t* bb = reinterpret_cast<const uint8_t*>(b);
  for (long i = blen - 1; i >= 0; --i) {
    if (a[i] != bb[i]) return false;
  }
  return true;
}

struct MappedFile {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok = false;

  explicit MappedFile(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return;
    struct stat st;
    if (::fstat(fd, &st) != 0) return;
    size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      ok = true;  // empty file: valid, zero records
      return;
    }
    void* m = ::mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) return;
    // WILLNEED (not SEQUENTIAL): kick off async readahead of the whole
    // file so IO overlaps the parse, WITHOUT the reclaim-behind hint —
    // SEQUENTIAL let the kernel drop pages behind the cursor, which
    // turned repeated-epoch reads into intermittent disk re-reads
    // (measured 5x epoch-time spikes on this ext4/virtio host).
    ::madvise(m, size, MADV_WILLNEED);
    data = static_cast<const uint8_t*>(m);
    ok = true;
  }

  ~MappedFile() {
    if (data) ::munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Single-pass core. Returns n_records (>=0) on success, -2 if out_cap
// was too small, -3 if n_cap was too small (offsets/kinds untrustworthy
// past n_cap; needed_bytes/n_records_out are exact either way).
template <typename KindT>
long parse_core(const uint8_t* data, size_t N, long num_keys,
                const char** keys, const long* key_lens,
                uint8_t* out_buf, long out_cap, long n_cap,
                long* offsets, KindT* kinds_out, long* needed_bytes,
                long* n_records_out) {
  Out out{out_buf, out_buf ? static_cast<uint64_t>(out_cap) : 0};

  std::vector<Slice> found(static_cast<size_t>(num_keys));
  std::vector<uint8_t> have(static_cast<size_t>(num_keys), 0);

  long n_records = 0;
  size_t pos = 0;
  if (offsets && n_cap > 0) offsets[0] = 0;
  while (pos + 12 <= N) {
    uint64_t len;
    std::memcpy(&len, data + pos, 8);  // little-endian host
    pos += 12;
    // Overflow-safe framing check: a corrupted length near 2^64 would
    // make `pos + len + 4` wrap (driving pos BACKWARDS — an infinite
    // loop on hostile input), so compare against the remaining bytes.
    if (len > N - pos || N - pos - len < 4) break;
    const uint8_t* payload = data + pos;
    pos += len + 4;

    std::memset(have.data(), 0, have.size());
    Cursor ex{payload, payload + len};
    uint32_t field, wire;
    Slice val;
    uint64_t vv;
    while (next_field(ex, &field, &wire, &val, &vv)) {
      if (field != 1 || wire != 2) continue;  // Example.features
      Cursor fs{val.p, val.p + val.len};
      while (next_field(fs, &field, &wire, &val, &vv)) {
        if (field != 1 || wire != 2) continue;  // map entry
        Cursor me{val.p, val.p + val.len};
        Slice key_s, feat_s;
        bool have_key = false, have_feat = false;
        while (next_field(me, &field, &wire, &val, &vv)) {
          if (field == 1 && wire == 2) {
            key_s = val;
            have_key = true;
          } else if (field == 2 && wire == 2) {
            feat_s = val;
            have_feat = true;
          }
        }
        if (!have_key || !have_feat) continue;
        for (long k = 0; k < num_keys; ++k) {
          if (key_eq(key_s.p, key_s.len, keys[k], key_lens[k])) {
            found[static_cast<size_t>(k)] = feat_s;
            have[static_cast<size_t>(k)] = 1;
            break;
          }
        }
      }
    }

    bool record_fits = n_records < n_cap;
    for (long k = 0; k < num_keys; ++k) {
      int kind = -1;
      if (have[static_cast<size_t>(k)]) {
        kind = parse_feature(found[static_cast<size_t>(k)], out);
      }
      if (offsets && record_fits) {
        long cell = n_records * num_keys + k;
        kinds_out[cell] = static_cast<KindT>(kind);
        offsets[cell + 1] = static_cast<long>(out.written);
      }
    }
    ++n_records;
  }

  if (needed_bytes) *needed_bytes = static_cast<long>(out.written);
  if (n_records_out) *n_records_out = n_records;
  if (n_records > n_cap && offsets) return -3;
  if (out_buf && static_cast<long>(out.written) > out_cap) return -2;
  return n_records;
}

}  // namespace

extern "C" {

// Legacy two-pass API.
// Pass 1 (out_buf == nullptr): fills *n_records_out and *needed_bytes.
// Pass 2: fills out_buf (cap out_cap), offsets[n*num_keys + 1] (byte
// offsets into out_buf per (record, key) cell, cumulative) and
// kinds[n*num_keys]. Returns the number of records, or -1 on error,
// -2 if out_cap is too small.
long tfrec_parse_file(const char* path, long num_keys,
                      const char** keys, const long* key_lens,
                      uint8_t* out_buf, long out_cap, long* offsets,
                      signed char* kinds, long* needed_bytes,
                      long* n_records_out) {
  MappedFile mf(path);
  if (!mf.ok) return -1;
  if (mf.size == 0) {
    if (needed_bytes) *needed_bytes = 0;
    if (n_records_out) *n_records_out = 0;
    return 0;
  }
  if (!out_buf) {
    return parse_core<signed char>(
        mf.data, mf.size, num_keys, keys, key_lens, nullptr, 0, 0,
        nullptr, nullptr, needed_bytes, n_records_out);
  }
  // Legacy callers sized offsets/kinds from pass 1, so trust them.
  long n_cap = 0x7FFFFFFFFFFFFFL;
  return parse_core<signed char>(
      mf.data, mf.size, num_keys, keys, key_lens, out_buf, out_cap,
      n_cap, offsets, kinds, needed_bytes, n_records_out);
}

// Single-pass API. offsets must hold n_cap*num_keys+1 longs and kinds
// n_cap*num_keys longs. Returns n_records on success; -1 on IO error;
// -2 out_cap too small; -3 n_cap too small. needed_bytes/n_records_out
// are exact on -2/-3, so one retry always succeeds.
long tfrec_parse_file2(const char* path, long num_keys,
                       const char** keys, const long* key_lens,
                       uint8_t* out_buf, long out_cap, long n_cap,
                       long* offsets, long* kinds,
                       long* needed_bytes, long* n_records_out) {
  MappedFile mf(path);
  if (!mf.ok) return -1;
  if (mf.size == 0) {
    if (needed_bytes) *needed_bytes = 0;
    if (n_records_out) *n_records_out = 0;
    return 0;
  }
  return parse_core<long>(mf.data, mf.size, num_keys, keys, key_lens,
                          out_buf, out_cap, n_cap, offsets, kinds,
                          needed_bytes, n_records_out);
}

// Fixed-width column API — the steady-state Criteo path. The caller
// declares, per key, the expected kind and exact cell byte width and
// supplies one destination buffer per key; record r's cell for key k
// is written at dsts[k] + r * widths[k], i.e. straight into the final
// [n, width] column-contiguous array. The generic API above instead
// packs all cells into one interleaved buffer that the Python side
// must re-copy per column (~the same byte volume as the parse itself,
// measured at 10-24 ms per 45 MB Criteo file) — this entry point makes
// that second copy never happen. Returns n_records on success; -1 on
// IO error; -3 when the file holds more than n_cap records
// (*n_records_out is exact, caller re-allocates and retries); -4 when
// any cell's kind or byte width deviates from the declaration (caller
// falls back to the generic API).
long tfrec_parse_file_cols(const char* path, long num_keys,
                           const char** keys, const long* key_lens,
                           uint8_t** dsts, const long* widths,
                           const long* kinds_expected, long n_cap,
                           long* n_records_out) {
  MappedFile mf(path);
  if (!mf.ok) return -1;
  if (n_records_out) *n_records_out = 0;
  if (mf.size == 0) return 0;
  const uint8_t* data = mf.data;
  const size_t N = mf.size;

  std::vector<Slice> found(static_cast<size_t>(num_keys));
  std::vector<uint8_t> have(static_cast<size_t>(num_keys), 0);

  long n_records = 0;
  bool mismatch = false;
  size_t pos = 0;
  while (pos + 12 <= N) {
    uint64_t len;
    std::memcpy(&len, data + pos, 8);  // little-endian host
    pos += 12;
    // Overflow-safe framing check (see parse_core).
    if (len > N - pos || N - pos - len < 4) break;
    const uint8_t* payload = data + pos;
    pos += len + 4;

    // Past capacity (or after a mismatch): keep counting records from
    // the framing alone so *n_records_out is exact for the retry, but
    // skip the content scan entirely.
    if (n_records >= n_cap || mismatch) {
      ++n_records;
      continue;
    }

    std::memset(have.data(), 0, have.size());
    Cursor ex{payload, payload + len};
    uint32_t field, wire;
    Slice val;
    uint64_t vv;
    while (next_field(ex, &field, &wire, &val, &vv)) {
      if (field != 1 || wire != 2) continue;  // Example.features
      Cursor fs{val.p, val.p + val.len};
      while (next_field(fs, &field, &wire, &val, &vv)) {
        if (field != 1 || wire != 2) continue;  // map entry
        Cursor me{val.p, val.p + val.len};
        Slice key_s, feat_s;
        bool have_key = false, have_feat = false;
        while (next_field(me, &field, &wire, &val, &vv)) {
          if (field == 1 && wire == 2) {
            key_s = val;
            have_key = true;
          } else if (field == 2 && wire == 2) {
            feat_s = val;
            have_feat = true;
          }
        }
        if (!have_key || !have_feat) continue;
        for (long k = 0; k < num_keys; ++k) {
          if (key_eq(key_s.p, key_s.len, keys[k], key_lens[k])) {
            found[static_cast<size_t>(k)] = feat_s;
            have[static_cast<size_t>(k)] = 1;
            break;
          }
        }
      }
    }

    for (long k = 0; k < num_keys; ++k) {
      const long w = widths[k];
      if (!have[static_cast<size_t>(k)]) {
        mismatch = true;
        break;
      }
      Out out{dsts[k] + n_records * w, static_cast<uint64_t>(w)};
      int kind = parse_feature(found[static_cast<size_t>(k)], out);
      if (kind != static_cast<int>(kinds_expected[k]) ||
          out.written != static_cast<uint64_t>(w)) {
        mismatch = true;
        break;
      }
    }
    ++n_records;
  }

  if (n_records_out) *n_records_out = n_records;
  if (mismatch) return -4;
  if (n_records > n_cap) return -3;
  return n_records;
}

}  // extern "C"
