// Native per-lane session feed: TS demux + ES segmentation + SBC ring.
//
// The host control plane's per-lane hot path (espflix_tpu/runtime/
// session.py StreamFeed/EsSegmenter/SbcRing) in C++, state-resident:
// one object holds N lanes; Python drives it through a handful of
// ctypes calls per lane per tick (or the *_many batched entry points,
// one call per tick for the whole fleet).  Profiling the 1k-lane
// serving scenario showed the Python wrapper costs (ctypes demux
// marshalling, numpy start-code scans, per-picture byte slicing)
// dominating at ~120 ms/tick on one host core; the reference dedicates
// a CPU core to this same pump+demux loop (espflix.cpp:723-737,
// player.cpp:459-493).
//
// Segmentation semantics mirror runtime/session.py exactly (same
// incremental start-code cache, same picture FSM, same PTS mark
// attribution, same header byte math); bit-identity is pinned by
// tests/test_native_feed.py.

#include <stdint.h>
#include <string.h>

#include <deque>
#include <utility>
#include <vector>

namespace {

constexpr int PKT = 188;
constexpr int VIDEO_PID = 0x100;

struct SeqInfo {
  int width = 0, height = 0;
  int has_iq = 0, has_nq = 0;
  uint8_t iq[64] = {0};
  uint8_t nq[64] = {0};
};

struct Lane {
  // demux state
  std::vector<uint8_t> tail;  // partial TS packet
  bool audio_started = false;
  bool sync_lost = false;
  // ES segmenter state (session.py EsSegmenter)
  std::vector<uint8_t> buf;
  long long base = 0;
  long scanned = 0;
  std::vector<std::pair<long, int>> codes;  // (pos, code)
  std::deque<std::pair<long long, long long>> pts_marks;
  long long last_pts = -1;
  bool eos = false;
  long long seq_parsed_abs = -1;
  long long seq_counter = 0;
  bool has_seq = false;
  SeqInfo seq;
  // audio ring (session.py SbcRing byte store; frame discovery and
  // framing stay in Python -- they run once / infrequently)
  std::vector<uint8_t> abuf;
  long long apts = -1;

  void reset() {
    tail.clear();
    audio_started = false;
    sync_lost = false;
    buf.clear();
    base = 0;
    scanned = 0;
    codes.clear();
    pts_marks.clear();
    last_pts = -1;
    eos = false;
    seq_parsed_abs = -1;
    // seq_counter / seq persist: Python caches SequenceInfo by
    // counter and a reset lane re-emits on its next parse
    has_seq = false;
    abuf.clear();
    apts = -1;
  }
};

struct Feed {
  std::vector<Lane> lanes;
};

static long long parse_pts(const uint8_t* d, int flags) {
  int check = (flags >> 2) & 0x30;
  if ((d[0] & 0xF0) != check) return -1;
  long long n = (long long)(d[0] & 0x0E) << 29;
  n += (long long)(((d[1] << 8 | d[2]) >> 1)) << 15;
  return n + ((d[3] << 8 | d[4]) >> 1);
}

// session.py _codes(): scan only bytes appended since the last scan
static void scan_codes(Lane& L) {
  long n = (long)L.buf.size();
  if (n >= 4 && n > L.scanned) {
    long start = L.scanned - 3;
    if (start < 0) start = 0;
    const uint8_t* a = L.buf.data();
    for (long p = start; p + 3 < n; p++) {
      if (a[p] == 0 && a[p + 1] == 0 && a[p + 2] == 1)
        L.codes.emplace_back(p, a[p + 3]);
    }
    L.scanned = n;
  }
}

// bitio.BitReader semantics incl. the EOS padding past the end
struct BitReader {
  const uint8_t* d;
  long n;
  long pos = 0;  // bits
  static const uint8_t EOSPAT[8];
  int byte_at(long i) const {
    if (i < n) return d[i];
    return EOSPAT[(i - n) % 8];
  }
  uint64_t get(int bits) {
    uint64_t v = 0;
    long first = pos >> 3, last = (pos + bits - 1) >> 3;
    for (long i = first; i <= last; i++) v = (v << 8) | byte_at(i);
    int drop = 7 - ((pos + bits - 1) & 7);
    pos += bits;
    return (v >> drop) & ((bits >= 64) ? ~0ULL : ((1ULL << bits) - 1));
  }
};
const uint8_t BitReader::EOSPAT[8] = {0, 0, 1, 0xB7, 0, 0, 1, 0xB7};

// session.py _parse_seq with the split-header guard: returns false
// (retry later) if the header's bytes haven't all arrived yet and the
// stream isn't at EOS.  (The Python BitReader pads past the end with
// the EOS pattern, so parsing early would cache garbage geometry.)
static bool try_parse_seq(Lane& L, long pos) {
  long avail = (long)L.buf.size() - (pos + 4);
  if (avail < 8 && !L.eos) return false;
  BitReader r{L.buf.data() + pos + 4, avail};
  SeqInfo s;
  s.width = (int)r.get(12);
  s.height = (int)r.get(12);
  r.get(4 + 4 + 18 + 12);
  s.has_iq = (int)r.get(1);
  if (s.has_iq) {
    if (avail < 72 && !L.eos) return false;
    for (int i = 0; i < 64; i++) s.iq[i] = (uint8_t)r.get(8);
  }
  s.has_nq = (int)r.get(1);
  if (s.has_nq) {
    long need = (64 + 512 * s.has_iq + 512 + 7) / 8;
    if (avail < need && !L.eos) return false;
    for (int i = 0; i < 64; i++) s.nq[i] = (uint8_t)r.get(8);
  }
  L.seq = s;
  L.has_seq = true;
  L.seq_counter++;
  return true;
}

static void consume(Lane& L, long end) {
  L.buf.erase(L.buf.begin(), L.buf.begin() + end);
  L.base += end;
  L.scanned = L.scanned - end;
  if (L.scanned < 0) L.scanned = 0;
  size_t w = 0;
  for (size_t i = 0; i < L.codes.size(); i++) {
    if (L.codes[i].first >= end) {
      L.codes[w] = {L.codes[i].first - end, L.codes[i].second};
      w++;
    }
  }
  L.codes.resize(w);
}

// meta_out layout shared by sf_pop_picture / sf_pop_pictures:
enum {
  M_PTYPE = 0,
  M_FULL_PEL,
  M_R_SIZE,
  M_PTS,
  M_PAYLOAD_LEN,
  M_NSLICES,
  M_SEQ_COUNTER,
  M_WIDTH,
  M_HEIGHT,
  M_HAS_IQ,
  M_HAS_NQ,
  M_SYNC_LOST,
  M_COUNT
};

// emit = session.py _emit; returns payload length written (payload /
// slices capped by caller capacities; overflow reported via ret<0 in
// the extern entry)
static int emit_picture(Lane& L, long start, long end, long pic_pos,
                        int64_t* meta, uint8_t* payload,
                        long payload_cap, int32_t* slice_off,
                        int32_t* slice_rows, int max_slices,
                        uint8_t* iq_out, uint8_t* nq_out) {
  uint8_t d[16] = {0};
  long have = (long)L.buf.size() - (pic_pos + 4);
  if (have > 8) have = 8;
  if (have > 0) memcpy(d, L.buf.data() + pic_pos + 4, have);
  int ptype = (d[1] >> 3) & 7;
  int full_pel = 0, r_size = 0;
  if (ptype == 2) {
    full_pel = (d[3] >> 2) & 1;
    r_size = (((d[3] & 3) << 1) | (d[4] >> 7)) - 1;
  }
  long long abs_pic = L.base + pic_pos;
  while (!L.pts_marks.empty() && L.pts_marks.front().first <= abs_pic) {
    L.last_pts = L.pts_marks.front().second;
    L.pts_marks.pop_front();
  }
  meta[M_PTYPE] = ptype;
  meta[M_FULL_PEL] = full_pel;
  meta[M_R_SIZE] = r_size;
  meta[M_PTS] = L.last_pts;
  meta[M_SEQ_COUNTER] = L.seq_counter;
  meta[M_WIDTH] = L.has_seq ? L.seq.width : 0;
  meta[M_HEIGHT] = L.has_seq ? L.seq.height : 0;
  meta[M_HAS_IQ] = L.seq.has_iq;
  meta[M_HAS_NQ] = L.seq.has_nq;
  meta[M_SYNC_LOST] = L.sync_lost;
  if (L.seq.has_iq && iq_out) memcpy(iq_out, L.seq.iq, 64);
  if (L.seq.has_nq && nq_out) memcpy(nq_out, L.seq.nq, 64);
  long plen = 0;
  int nsl = 0;
  int rc = 1;
  if (ptype == 1 || ptype == 2) {
    // slice start codes inside [start, end), already cached
    long sbase = -1;
    for (auto& pc : L.codes) {
      if (pc.first < start || pc.first >= end) continue;
      int c = pc.second;
      if (c < 0x01 || c > 0xAF) continue;
      if (sbase < 0) sbase = pc.first;
      if (nsl < max_slices) {
        slice_off[nsl] = (int32_t)((pc.first - sbase) * 8 + 32);
        slice_rows[nsl] = c - 1;
      }
      nsl++;
    }
    if (nsl > max_slices) rc = -1;  // caller re-sizes and retries
    if (sbase >= 0 && rc == 1) {
      plen = end - sbase;
      if (plen > payload_cap) {
        rc = -2;
        plen = 0;
      } else {
        memcpy(payload, L.buf.data() + sbase, plen);
      }
    }
  }
  meta[M_PAYLOAD_LEN] = plen;
  meta[M_NSLICES] = nsl;
  if (rc == 1) consume(L, end);
  return rc;
}

// session.py pop_picture FSM
static int pop_picture(Lane& L, int64_t* meta, uint8_t* payload,
                       long payload_cap, int32_t* slice_off,
                       int32_t* slice_rows, int max_slices,
                       uint8_t* iq_out, uint8_t* nq_out) {
  scan_codes(L);
  long pend = -1, pic_start = -1, pic_pos = -1;
  for (auto& pc : L.codes) {
    long pos = pc.first;
    int code = pc.second;
    if (code == 0xB3 || code == 0xB8 || code == 0xB2 || code == 0xB5) {
      if (pic_pos >= 0)
        return emit_picture(L, pic_start, pend >= 0 ? pend : pos,
                            pic_pos, meta, payload, payload_cap,
                            slice_off, slice_rows, max_slices, iq_out,
                            nq_out);
      if (pend < 0) pend = pos;
      if (code == 0xB3 && L.base + pos != L.seq_parsed_abs) {
        if (try_parse_seq(L, pos)) L.seq_parsed_abs = L.base + pos;
      }
    } else if (code == 0x00) {
      if (pic_pos >= 0)
        return emit_picture(L, pic_start, pend >= 0 ? pend : pos,
                            pic_pos, meta, payload, payload_cap,
                            slice_off, slice_rows, max_slices, iq_out,
                            nq_out);
      pic_start = pend >= 0 ? pend : pos;
      pic_pos = pos;
      pend = -1;
    } else if (code == 0xB7) {
      if (pic_pos >= 0)
        return emit_picture(L, pic_start, pos, pic_pos, meta, payload,
                            payload_cap, slice_off, slice_rows,
                            max_slices, iq_out, nq_out);
      return 0;
    } else {
      pend = -1;
    }
  }
  if (pic_pos >= 0 && L.eos)
    return emit_picture(L, pic_start, (long)L.buf.size(), pic_pos,
                        meta, payload, payload_cap, slice_off,
                        slice_rows, max_slices, iq_out, nq_out);
  return 0;
}

// StreamFeed.feed(): tail join + demux straight into lane state
static void feed_bytes(Lane& L, const uint8_t* data, long len) {
  std::vector<uint8_t> joined;
  const uint8_t* src = data;
  long n_all = len;
  if (!L.tail.empty()) {
    joined.reserve(L.tail.size() + len);
    joined.insert(joined.end(), L.tail.begin(), L.tail.end());
    joined.insert(joined.end(), data, data + len);
    src = joined.data();
    n_all = (long)joined.size();
    L.tail.clear();
  }
  long n = n_all / PKT;
  if (n_all > n * PKT)
    L.tail.assign(src + n * PKT, src + n_all);
  if (!n) return;
  for (long k = 0; k < n; k++) {
    const uint8_t* d = src + k * PKT;
    if (d[0] != 0x47) {
      L.sync_lost = true;
      break;
    }
    int pid = ((d[1] << 8) | d[2]) & 0x1FFF;
    int pusi = d[1] & 0x40;
    int ofs = (d[3] & 0x20) ? 5 + d[4] : 4;
    if (!(d[3] & 0x10) || ofs >= PKT) continue;
    const uint8_t* p = d + ofs;
    int plen = PKT - ofs;
    if (pid == VIDEO_PID) {
      if (pusi && plen >= 14) {
        int flags = (p[6] << 8) | p[7];
        int hdr = 9 + p[8];
        if (flags & 0x0080) {
          long long pts = parse_pts(p + 9, flags);
          if (pts != -1)
            L.pts_marks.emplace_back(L.base + (long long)L.buf.size(),
                                     pts);
        }
        p += hdr;
        plen -= hdr;
      }
      if (plen > 0) L.buf.insert(L.buf.end(), p, p + plen);
    } else if (pid == 0x101 || pid == 0x102) {
      if (pusi && plen >= 14) {
        int flags = (p[6] << 8) | p[7];
        int hdr = 9 + p[8];
        long long pts = -1;
        if (flags & 0x0080) pts = parse_pts(p + 9, flags);
        p += hdr;
        plen -= hdr;
        L.audio_started = true;
        if (pts != -1) L.apts = pts;
      }
      if (L.audio_started && plen > 0)
        L.abuf.insert(L.abuf.end(), p, p + plen);
    }
  }
}

}  // namespace

extern "C" {

void* sf_create(int n_lanes) {
  Feed* f = new Feed();
  f->lanes.resize(n_lanes);
  return f;
}

void sf_destroy(void* h) { delete (Feed*)h; }

void sf_reset(void* h, int lane) { ((Feed*)h)->lanes[lane].reset(); }

int sf_feed(void* h, int lane, const uint8_t* data, long len) {
  Lane& L = ((Feed*)h)->lanes[lane];
  feed_bytes(L, data, len);
  return L.sync_lost ? 1 : 0;
}

void sf_eos(void* h, int lane) { ((Feed*)h)->lanes[lane].eos = true; }

// 1 = picture (meta/payload/slices filled), 0 = none,
// -1 = slice capacity exceeded, -2 = payload capacity exceeded
int sf_pop_picture(void* h, int lane, int64_t* meta, uint8_t* payload,
                   long payload_cap, int32_t* slice_off,
                   int32_t* slice_rows, int max_slices, uint8_t* iq_out,
                   uint8_t* nq_out) {
  Lane& L = ((Feed*)h)->lanes[lane];
  return pop_picture(L, meta, payload, payload_cap, slice_off,
                     slice_rows, max_slices, iq_out, nq_out);
}

// Batched pop: one call for the whole fleet.  lanes[i] selects the
// lane; per-lane outputs are strided into flat arrays.  payload arena
// is shared: payload_off[i] gives each picture's offset.  Returns the
// number of pictures, or -1 if the arena / slice capacity overflowed
// (caller grows and retries; rc_out[i] holds each lane's own rc).
int sf_pop_pictures(void* h, const int32_t* lanes, int n,
                    int64_t* meta /* [n, M_COUNT] */,
                    uint8_t* arena, long arena_cap,
                    int64_t* payload_off /* [n] */,
                    int32_t* slice_off /* [n, max_slices] */,
                    int32_t* slice_rows, int max_slices,
                    uint8_t* iq_out /* [n, 64] */, uint8_t* nq_out,
                    int32_t* rc_out /* [n] */) {
  Feed* f = (Feed*)h;
  long pos = 0;
  int got = 0;
  int bad = 0;
  for (int i = 0; i < n; i++) {
    Lane& L = f->lanes[lanes[i]];
    int rc = pop_picture(L, meta + (long)i * M_COUNT, arena + pos,
                         arena_cap - pos, slice_off + (long)i * max_slices,
                         slice_rows + (long)i * max_slices, max_slices,
                         iq_out + (long)i * 64, nq_out + (long)i * 64);
    rc_out[i] = rc;
    payload_off[i] = pos;
    if (rc == 1) {
      pos += meta[(long)i * M_COUNT + M_PAYLOAD_LEN];
      got++;
    } else if (rc < 0) {
      bad = 1;
    }
  }
  return bad ? -1 : got;
}

// Packed batched pop: pops land DIRECTLY in the device batch layout
// (models/mpeg1.py make_picture_batch), bypassing the per-picture
// PictureData marshalling entirely.  words is the fleet's persistent
// [n_slots, words_cap] uint32 buffer viewed as bytes; slots[i] selects
// lane i's destination row.  Each popped payload is written in place,
// EOS-padded (00 00 01 B7 x2 after pad bytes of the same pattern),
// byteswapped to the device's big-endian word packing, and the stale
// region above it (up to the row's previous high-water, prev_nw) is
// zeroed so the row is bit-identical to a freshly zeroed batch row.
// slice_off/slice_rows are the batch's own [n_slots, max_slices]
// arrays.  rc semantics per lane match sf_pop_pictures (1/0/-1/-2);
// -2 additionally covers payloads too big for the row (the picture is
// NOT consumed -- the caller pops it via the scratch path and applies
// the oversize policy).  Returns the number of pictures, or -1 if any
// lane reported a capacity rc (caller resolves those lanes alone).
int sf_pop_pictures_packed(void* h, const int32_t* lanes, int n,
                           const int32_t* slots,
                           int64_t* meta /* [n, M_COUNT] */,
                           uint8_t* words, long words_cap /* u32s */,
                           int32_t* prev_nw /* [n_slots] */,
                           int32_t* n_words_out /* [n_slots] */,
                           int32_t* slice_off /* [n_slots, max] */,
                           int32_t* slice_rows, int max_slices,
                           uint8_t* iq_out /* [n, 64] */,
                           uint8_t* nq_out, int32_t* rc_out) {
  static const uint8_t EOSPAT[8] = {0, 0, 1, 0xB7, 0, 0, 1, 0xB7};
  Feed* f = (Feed*)h;
  const long row_bytes = words_cap * 4;
  int got = 0, bad = 0;
  for (int i = 0; i < n; i++) {
    Lane& L = f->lanes[lanes[i]];
    const int32_t s = slots[i];
    uint8_t* row = words + (long)s * row_bytes;
    // cap so payload + pad + 16B EOS always fits words_cap words
    int rc = pop_picture(L, meta + (long)i * M_COUNT, row,
                         (words_cap - 4) * 4,
                         slice_off + (long)s * max_slices,
                         slice_rows + (long)s * max_slices, max_slices,
                         iq_out + (long)i * 64, nq_out + (long)i * 64);
    rc_out[i] = rc;
    if (rc < 0) bad = 1;
    if (rc != 1) continue;
    got++;
    const long plen = meta[(long)i * M_COUNT + M_PAYLOAD_LEN];
    const long pad = (4 - (plen & 3)) & 3;
    uint8_t* p = row + plen;
    for (long j = 0; j < pad; j++) p[j] = EOSPAT[j];
    memcpy(p + pad, EOSPAT, 8);
    memcpy(p + pad + 8, EOSPAT, 8);
    const long nw = (plen + pad) / 4 + 4;
    uint32_t* w = (uint32_t*)row;
    for (long j = 0; j < nw; j++) w[j] = __builtin_bswap32(w[j]);
    if (prev_nw[s] > nw)
      memset(row + nw * 4, 0, ((long)prev_nw[s] - nw) * 4);
    prev_nw[s] = (int32_t)nw;
    n_words_out[s] = (int32_t)nw;
  }
  return bad ? -1 : got;
}

// Batched feed: data is the concatenation of each lane's chunk;
// offs[i]..offs[i+1] delimits lane i's bytes.  Returns count of lanes
// now flagged sync_lost.
int sf_feed_many(void* h, const int32_t* lanes, int n,
                 const uint8_t* data, const int64_t* offs) {
  Feed* f = (Feed*)h;
  int lost = 0;
  for (int i = 0; i < n; i++) {
    Lane& L = f->lanes[lanes[i]];
    feed_bytes(L, data + offs[i], (long)(offs[i + 1] - offs[i]));
    lost += L.sync_lost ? 1 : 0;
  }
  return lost;
}

long sf_audio_len(void* h, int lane) {
  return (long)((Feed*)h)->lanes[lane].abuf.size();
}

long long sf_audio_pts(void* h, int lane) {
  return ((Feed*)h)->lanes[lane].apts;
}

// copy up to maxn leading bytes WITHOUT consuming (frame discovery)
long sf_audio_peek(void* h, int lane, uint8_t* out, long maxn) {
  Lane& L = ((Feed*)h)->lanes[lane];
  long n = (long)L.abuf.size();
  if (n > maxn) n = maxn;
  if (n > 0) memcpy(out, L.abuf.data(), n);
  return n;
}

// pop up to max_frames whole frames of frame_size bytes; returns k
int sf_audio_pop(void* h, int lane, int frame_size, int max_frames,
                 uint8_t* out) {
  Lane& L = ((Feed*)h)->lanes[lane];
  if (frame_size <= 0) return 0;
  long k = (long)L.abuf.size() / frame_size;
  if (k > max_frames) k = max_frames;
  if (k > 0) {
    memcpy(out, L.abuf.data(), k * frame_size);
    L.abuf.erase(L.abuf.begin(), L.abuf.begin() + k * frame_size);
  }
  return (int)k;
}

// Batched audio pop: one call pops up to max_frames whole frames per
// lane straight into the tick's [n, max_frames, stride] arena
// (frame_sizes[i] <= stride; rows land at byte stride `stride`, the
// tail of each row is left as the caller allocated it -- callers pass
// a zeroed arena).  counts[i] = frames popped.  This is the fused-
// chain audio gather (the reference's audio thread drains its one
// SBC ring continuously, video.cpp:964-987; a fleet drains N rings
// in one call).
void sf_audio_pop_batch(void* h, const int32_t* lanes, int n,
                        const int32_t* frame_sizes,
                        const int32_t* out_rows, int max_frames,
                        int stride, uint8_t* out, int32_t* counts) {
  Feed* F = (Feed*)h;
  for (int i = 0; i < n; i++) {
    Lane& L = F->lanes[lanes[i]];
    const int fs = frame_sizes[i];
    int32_t k = 0;
    if (fs > 0 && fs <= stride) {
      long kk = (long)L.abuf.size() / fs;
      if (kk > max_frames) kk = max_frames;
      k = (int32_t)kk;
      uint8_t* dst = out + (size_t)out_rows[i] * max_frames * stride;
      const uint8_t* src = L.abuf.data();
      for (int32_t j = 0; j < k; j++)
        memcpy(dst + (size_t)j * stride, src + (size_t)j * fs, fs);
      if (k > 0)
        L.abuf.erase(L.abuf.begin(), L.abuf.begin() + (long)k * fs);
    }
    counts[i] = k;
  }
}

// drop all buffered audio bytes (fault-injection / flush paths)
void sf_audio_clear(void* h, int lane) {
  ((Feed*)h)->lanes[lane].abuf.clear();
}

// overwrite one buffered audio byte (fault injection)
void sf_audio_poke(void* h, int lane, long off, int value) {
  Lane& L = ((Feed*)h)->lanes[lane];
  if (off >= 0 && off < (long)L.abuf.size())
    L.abuf[off] = (uint8_t)value;
}

int sf_sync_lost(void* h, int lane) {
  return ((Feed*)h)->lanes[lane].sync_lost ? 1 : 0;
}

}  // extern "C"
