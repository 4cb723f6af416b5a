// Composite-signal + delta-sigma oracle (clean-room, native C++).
//
// Golden generator for the NTSC/PAL scanline synthesizer and the PDM
// audio modulator, implementing the exact DAC-byte semantics of the
// reference (/root/reference/src/video.cpp blit/burst/blanking/
// composite, espflix.ino pdm_second_order) in scalar form.  The output
// convention matches espflix_tpu/ops/composite.py: uint8 DAC samples in
// temporal order (the reference's 16-bit packing artifacts and I2S
// position swap are normalized away; see video/tables.py docstring).

#include <stdint.h>
#include <string.h>
#include <math.h>

namespace {

static int IRE(double x) { return (int)((x + 40) * 255 / 3.3 / 147.5); }

static int SYNC_L, BLANK_L, BLACK_L;

static uint8_t ctu[256][4], ctv[256][4], ctvn[256][4];
static int DITHER[8][4] = {
    {1, 3, 2, 0}, {2, 0, 1, 3}, {0, 1, 3, 2}, {3, 2, 0, 1},
    {2, 0, 1, 3}, {1, 3, 2, 0}, {3, 2, 0, 1}, {0, 1, 3, 2},
};

static int rup(double v) { return v < 0 ? -(int)(-v + 0.5) : (int)(v + 0.5); }
static int pin127(int p) { return p < 0 ? 0 : (p > 127 ? 127 : p); }

static void gen_tab(uint8_t out[256][4], double (*fn)(int)) {
    double scale = BLACK_L / 33.0;
    for (int c = 0; c < 256; c++) {
        int comp = 128 - c;
        int b[4];
        for (int i = 0; i < 4; i++)
            b[i] = pin127(rup(fn(i) * comp * scale) + 2 * BLACK_L);
        // pack msb-first then swaz 0123->0213, then unpack little-endian:
        // equivalent: word bytes [3..0] = b0,b2,b1,b3 -> byte k of the
        // packed word: k=3 -> b0, k=2 -> b2, k=1 -> b1, k=0 -> b3.
        out[c][3] = b[0]; out[c][2] = b[2]; out[c][1] = b[1];
        out[c][0] = b[3];
    }
}

static double fsin(int i) { return sin(2 * M_PI * i / 4); }
static double fcos(int i) { return cos(2 * M_PI * i / 4); }
static double fcosn(int i) { return -cos(2 * M_PI * i / 4); }

static void init_tabs() {
    static bool done = false;
    if (done) return;
    SYNC_L = IRE(-40); BLANK_L = IRE(0); BLACK_L = IRE(7.5);
    gen_tab(ctu, fsin);
    gen_tab(ctv, fcos);
    gen_tab(ctvn, fcosn);
    done = true;
}

static int usec_(double us, double rate_mhz) {
    unsigned r = (unsigned)(us * rate_mhz);
    return ((r + 4) / 8) * 8;
}

struct Geo {
    int line_width, line_count, hsync, hsync_long, hsync_short;
    int burst_start, burst_width, active_start, active_top, vsync_start;
    int shift;
};

static Geo geo(int pal) {
    Geo g;
    if (!pal) {
        double rate = 315.0 / 88 * 4;
        g.line_width = 912; g.line_count = 262;
        g.hsync = usec_(4.7, rate);
        g.hsync_long = usec_(63.555 - 4.7, rate);
        g.active_start = usec_(10, rate);
        g.active_top = 32; g.vsync_start = 259; g.shift = 0;
        g.burst_start = g.hsync; g.burst_width = 40; g.hsync_short = 0;
    } else {
        double rate = 4.43361875 * 4;
        g.line_width = 1136; g.line_count = 312;
        g.hsync = usec_(4.7, rate);
        g.hsync_short = usec_(2, rate);
        g.hsync_long = usec_(30, rate);
        g.burst_start = usec_(5.6, rate);
        g.burst_width = 44;
        g.active_start = usec_(10.4, rate);
        g.active_top = 64; g.vsync_start = 304; g.shift = 80;
    }
    return g;
}

static void pal_bursts(const Geo& g, uint8_t* b0o, uint8_t* b1o) {
    int bl = BLANK_L << 8;
    int16_t b0[64], b1[64];
    float phase = (float)(2 * M_PI / 2);
    for (int i = 0; i < g.burst_width; i++) {
        b0[i] = (int16_t)(bl + sin((double)phase + 3 * M_PI / 4) * bl / 1.5);
        b1[i] = (int16_t)(bl + sin((double)phase - 3 * M_PI / 4) * bl / 1.5);
        phase = (float)(phase + (float)(2 * M_PI / 4));
    }
    for (int j = 0; j < g.burst_width; j++) {
        int v0 = b0[j ^ 1] >> 8, v1 = b1[j ^ 1] >> 8;
        b0o[j] = (uint8_t)(v0 < 0 ? 0 : v0);
        b1o[j] = (uint8_t)(v1 < 0 ? 0 : v1);
    }
}

}  // namespace

extern "C" {

int composite_geometry(int pal, int* line_count, int* line_width) {
    Geo g = geo(pal);
    if (line_count) *line_count = g.line_count;
    if (line_width) *line_width = g.line_width;
    return 0;
}

// y: 192x352, u/v: 96x176, osd: 16x80 (or NULL), out:
// line_count*line_width DAC bytes, temporal order.
void composite_field(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                     int frame_parity, int pal, const uint8_t* osd,
                     int blend, int progress, uint8_t* out) {
    init_tabs();
    Geo g = geo(pal);
    const int W = 352, CW = 176, H = 192;
    uint8_t burst0[64], burst1[64];
    if (pal) pal_bursts(g, burst0, burst1);

    for (int ln = 0; ln < g.line_count; ln++) {
        uint8_t* line = out + (size_t)ln * g.line_width;
        bool vsync = ln >= g.vsync_start;
        if (vsync && !pal) {
            memset(line, BLANK_L, g.line_width);
            memset(line, SYNC_L, g.hsync_long);
            continue;
        }
        if (vsync && pal) {
            static const int st[8] = {0, 0, 0, 3, 3, 2, 0, 0};
            int t = st[ln - g.vsync_start];
            int halfw = g.line_width / 2;
            for (int h = 0; h < 2; h++) {
                int flag = h == 0 ? (t & 2) : (t & 1);
                int sw = flag ? g.hsync_long : g.hsync_short;
                memset(line + h * halfw, BLANK_L, halfw);
                memset(line + h * halfw, SYNC_L, sw);
            }
            continue;
        }
        // blank base: sync + black + burst
        memset(line, BLACK_L, g.line_width);
        memset(line, SYNC_L, g.hsync);
        if (!pal) {
            // buffer pos i..i+3 = [+BL/2, 0, -BL/2, 0] around BL
            // (video.cpp:817-821); temporal sample t plays buffer[t^1]
            int bl = BLANK_L;
            int pos[4] = {bl + bl / 2, bl, bl - bl / 2, bl};
            for (int i = 0; i < 40; i += 4) {
                line[g.hsync + i + 0] = (uint8_t)pos[1];
                line[g.hsync + i + 1] = (uint8_t)pos[0];
                line[g.hsync + i + 2] = (uint8_t)pos[3];
                line[g.hsync + i + 3] = (uint8_t)pos[2];
            }
        } else {
            const uint8_t* b = (ln & 1) ? burst0 : burst1;
            memcpy(line + g.burst_start, b, g.burst_width);
        }

        int x0 = g.active_start + 16 + g.shift;
        if (ln >= g.active_top && ln < g.active_top + H) {
            int row = ln - g.active_top;
            const int* dr = DITHER[(frame_parity << 2) + (row & 3)];
            const uint8_t* yr = y + (size_t)row * W;
            int half = row >> 1;
            int nxt = half + (row == H - 1 ? 0 : 1);
            if (nxt > 95) nxt = 95;
            const uint8_t* u0 = u + (size_t)half * CW;
            const uint8_t* v0r = v + (size_t)half * CW;
            const uint8_t* u1 = u + (size_t)nxt * CW;
            const uint8_t* v1r = v + (size_t)nxt * CW;
            bool odd = row & 1;
            int Pprev = 0, p0prev = 0;
            for (int x = 0; x < W; x++) {
                int P = (yr[x] + dr[x & 3]) & 0xFC;
                int p0 = P >> 2;
                int sa = (x % 4 == 0) ? ((p0 + p0prev) >> 1)
                                      : (((Pprev >> 1) + (P >> 1)) >> 2);
                int cx = x >> 1;
                int uu = odd ? ((u0[cx] >> 1) + (u1[cx] >> 1)) : u0[cx];
                int vv = odd ? ((v0r[cx] >> 1) + (v1r[cx] >> 1)) : v0r[cx];
                const uint8_t(*vt)[4] = (odd && pal) ? ctvn : ctv;
                int ka = 3 - (x & 1), kb = 1 - (x & 1);
                int ca = ((ctu[uu][ka] + vt[vv][ka]) & 0xFC) >> 2;
                int cb = ((ctu[uu][kb] + vt[vv][kb]) & 0xFC) >> 2;
                line[x0 + 2 * x] = (uint8_t)(sa + ca);
                line[x0 + 2 * x + 1] = (uint8_t)(p0 + cb);
                Pprev = P; p0prev = p0;
            }
        }

        // OSD (video.cpp:845-887)
        int otop = g.active_top + H + 2;
        if (osd && blend != 0 && ln >= otop && ln < otop + 16) {
            int l = ln - otop;
            int scale = 63;
            if (blend != -1 && blend < 32) scale = (63 * blend) >> 5;
            int ox = x0 + 16;
            for (int i = 0; i < 80; i++) {
                int p = ((BLACK_L << 8) + osd[l * 80 + i] * scale) >> 8;
                line[ox + 2 * i] = (uint8_t)p;
                line[ox + 2 * i + 1] = (uint8_t)p;
            }
            if (l >= 3 && l <= 8) {
                int bx = ox + 160 + 16;
                int c0 = ((BLACK_L << 8) + (scale << 8)) >> 8;
                int c1 = ((BLACK_L << 8) + (scale << 7)) >> 8;
                for (int i = 0; i < 240; i += 2) {
                    int c = i < progress ? c0 : c1;
                    for (int k = 0; k < 4; k++)
                        line[bx + 2 * i + k] = (uint8_t)c;
                }
            }
        }
    }
}

// Second-order PDM modulator (espflix.ino:73-107). state3 carries
// i0,i1,i2; out receives 2 uint16 words per sample.
void pdm_modulate(const int16_t* pcm, long n, int32_t* state3,
                  uint16_t* out) {
    const int32_t a1 = (int32_t)(0x7FFF * 1.18940);
    const int32_t a2 = (int32_t)(0x7FFF * 2.12340);
    int32_t i0 = state3[0], i1 = state3[1], i2 = state3[2];
    int32_t s = 0;
    long len = n << 1;
    const int16_t* src = pcm;
    while (len--) {
        if (len & 1) s = *src++ * 2;
        i0 = (i0 + s) >> 1;
        uint32_t b = 0;
        for (int k = 0; k < 16; k++) {
            b <<= 1;
            if (i2 >= 0) {
                i1 += i0 - a1 - (i2 >> 7);
                i2 += i1 - a2;
                b |= 1;
            } else {
                i1 += i0 + a1 - (i2 >> 7);
                i2 += i1 + a2;
            }
        }
        *out++ = (uint16_t)b;
    }
    state3[0] = i0; state3[1] = i1; state3[2] = i2;
}

}  // extern "C"
