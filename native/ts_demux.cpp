// Native bulk TS demuxer (runtime hot path).
//
// The per-stream Python demux walker is fine for tens of lanes; feeding
// thousands of concurrent streams is a byte-bashing job that belongs in
// native code (the reference's demux is C++ too, /root/reference/src/
// player.cpp:381-493).  One call demuxes a TS buffer into the video
// elementary stream + PES PTS marks + raw audio payload bytes with
// their PTS marks.  Loaded via ctypes (espflix_tpu/streaming/native.py)
// with a pure-Python fallback.

#include <stdint.h>
#include <string.h>

namespace {
constexpr int PKT = 188;
constexpr int VIDEO_PID = 0x100;

static long long parse_pts(const uint8_t* d, int flags) {
    int check = (flags >> 2) & 0x30;
    if ((d[0] & 0xF0) != check) return -1;
    long long n = (long long)(d[0] & 0x0E) << 29;
    n += (long long)(((d[1] << 8 | d[2]) >> 1)) << 15;
    return n + ((d[3] << 8 | d[4]) >> 1);
}
}  // namespace

extern "C" {

// Returns 0 on success, -1 on sync loss (outputs hold data demuxed so
// far). All output buffers are caller-allocated:
//   video_out: >= len bytes; *video_len written
//   vmark_off/vmark_pts: up to max_marks entries; *n_vmarks written
//   audio_out: >= len bytes; *audio_len written
//   amark_off/amark_pts: audio PES marks
//   audio_started: nonzero if an audio PES was already open when this
//   buffer begins (its continuing payload bytes are emitted)
int ts_demux_bulk(const uint8_t* ts, long len,
                  uint8_t* video_out, long* video_len,
                  long* vmark_off, long long* vmark_pts, int* n_vmarks,
                  int max_marks,
                  uint8_t* audio_out, long* audio_len,
                  long* amark_off, long long* amark_pts, int* n_amarks,
                  int audio_started) {
    // audio_started carries the cross-call PES state: payload bytes of
    // an audio PES that began in a PREVIOUS buffer must not be dropped
    long vpos = 0, apos = 0;
    int nv = 0, na = 0;
    int rc = 0;
    long n = len / PKT;
    for (long k = 0; k < n; k++) {
        const uint8_t* d = ts + k * PKT;
        if (d[0] != 0x47) { rc = -1; break; }
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
                    if (pts != -1 && nv < max_marks) {
                        vmark_off[nv] = vpos;
                        vmark_pts[nv] = pts;
                        nv++;
                    }
                }
                p += hdr; plen -= hdr;
            }
            if (plen > 0) { memcpy(video_out + vpos, p, plen); vpos += plen; }
        } else if (pid == 0x101 || pid == 0x102) {
            long long pts = -1;
            if (pusi && plen >= 14) {
                int flags = (p[6] << 8) | p[7];
                int hdr = 9 + p[8];
                if (flags & 0x0080) pts = parse_pts(p + 9, flags);
                p += hdr; plen -= hdr;
                audio_started = 1;
                if (na < max_marks) {
                    amark_off[na] = apos;
                    amark_pts[na] = pts;
                    na++;
                }
            }
            if (audio_started && plen > 0) {
                memcpy(audio_out + apos, p, plen);
                apos += plen;
            }
        }
    }
    *video_len = vpos;
    *audio_len = apos;
    *n_vmarks = nv;
    *n_amarks = na;
    return rc;
}

}  // extern "C"
