// MPEG-1 oracle decoder (clean-room, native C++).
//
// Golden YUV generator for bit-exactness tests of the TPU framework.
// Implements the same ISO 11172-2 subset and exact integer semantics as
// the reference decoder (/root/reference/src/player.cpp) -- I/P pictures,
// half-pel forward motion compensation, oddifying dequant, the same
// fixed-point IDCT constants, PIN saturation to [0,248], double-buffered
// plane alternation -- but as an independent implementation on contiguous
// planes, using flat peek-LUT VLC decode (tables generated from the
// canonical spec tables in espflix_tpu/core/vlc_tables.py).
//
// Intentionally mirrored reference quirks (see core/refdec.py docstring):
// B/D pictures ignored, slice-first macroblock advances one position,
// quant matrices indexed in transmission order.

#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#include "vlc_luts.h"

namespace {

constexpr int I_FRAME = 1, P_FRAME = 2;
constexpr int MBT_QUANT = 0x10, MBT_MOTION_F = 0x08, MBT_PATTERN = 0x02,
              MBT_INTRA = 0x01;
constexpr int DCT_COEFF_K = 1, DCT_EOB_K = 2, DCT_ESC_K = 3;

struct BitReader {
    const uint8_t* data;
    long len;     // bytes
    long pos;     // bit position
    // EOS padding: sequence_end start codes (player.cpp:456)
    static const uint8_t eos[8];

    uint8_t byte_at(long i) const {
        if (i < len) return data[i];
        return eos[(i - len) & 7];
    }
    uint32_t peek(int n) const {
        long first = pos >> 3, last = (pos + n - 1) >> 3;
        uint64_t v = 0;
        for (long i = first; i <= last; i++) v = (v << 8) | byte_at(i);
        int drop = 7 - ((pos + n - 1) & 7);
        return (uint32_t)((v >> drop) & ((1ull << n) - 1));
    }
    uint32_t get(int n) { uint32_t v = peek(n); pos += n; return v; }
    void skip(int n) { pos += n; }
    bool at_end() const { return pos >= 8 * len; }
};
const uint8_t BitReader::eos[8] = {0,0,1,0xB7,0,0,1,0xB7};

static inline int lut_value(int32_t e) {
    int v = e & 0xFFFF;
    return v >= 0x8000 ? v - 0x10000 : v;
}
static inline int lut_length(int32_t e) { return (e >> 16) & 0xFF; }

static inline int pin248(int v) { return v < 0 ? 0 : (v > 248 ? 248 : v); }

struct Decoder {
    int width = 0, height = 0, mb_width = 0, mb_height = 0;
    int32_t intra_q[64], non_intra_q[64];
    int picture_coding_type = 0, full_pel_forward = 0, forward_r_size = 0;
    int quantizer_scale = 0;
    int mb_x = 0, mb_y = 0;
    int y_dc = 128, u_dc = 128, v_dc = 128;
    int fwd_h = 0, fwd_v = 0;
    int fb_index = 0;
    long long pts = -1, last_pts = -1;

    // double-buffered planes
    uint8_t* planes[2][3] = {{nullptr}};

    // output
    uint8_t *out_y, *out_u, *out_v;
    long long* out_pts;
    int max_frames, n_frames = 0;
    int error = 0;

    ~Decoder() {
        for (int i = 0; i < 2; i++)
            for (int p = 0; p < 3; p++) free(planes[i][p]);
    }

    uint8_t* cur(int p) { return planes[fb_index & 1][p]; }
    uint8_t* ref(int p) { return planes[(fb_index + 1) & 1][p]; }

    void alloc_planes() {
        int w = mb_width * 16, h = mb_height * 16;
        for (int i = 0; i < 2; i++) {
            planes[i][0] = (uint8_t*)calloc(1, (size_t)w * h);
            planes[i][1] = (uint8_t*)calloc(1, (size_t)(w / 2) * (h / 2));
            planes[i][2] = (uint8_t*)calloc(1, (size_t)(w / 2) * (h / 2));
        }
        width = w; height = h;
    }

    int get_vlc(BitReader& r, const int32_t* lut, int peek_bits) {
        int32_t e = lut[r.peek(peek_bits)];
        if (e == 0) { error = 2; return 0; }
        r.skip(lut_length(e));
        return lut_value(e);
    }

    void sequence(BitReader& r) {
        int w = r.get(12), h = r.get(12);
        r.get(4); r.get(4); r.get(18); r.get(12);
        if (r.get(1)) for (int i = 0; i < 64; i++) intra_q[i] = r.get(8);
        else for (int i = 0; i < 64; i++) intra_q[i] = DEFAULT_INTRA_Q[i];
        if (r.get(1)) for (int i = 0; i < 64; i++) non_intra_q[i] = r.get(8);
        else for (int i = 0; i < 64; i++) non_intra_q[i] = 16;
        int mw = (w + 15) >> 4, mh = (h + 15) >> 4;
        if (mw != mb_width || mh != mb_height) {
            mb_width = mw; mb_height = mh;
            alloc_planes();
        }
    }

    void flush_picture(int mode = 0) {
        if (last_pts != -1 || mode) {
            if (n_frames < max_frames) {
                size_t ysz = (size_t)width * height;
                size_t csz = ysz / 4;
                memcpy(out_y + (size_t)n_frames * ysz, cur(0), ysz);
                memcpy(out_u + (size_t)n_frames * csz, cur(1), csz);
                memcpy(out_v + (size_t)n_frames * csz, cur(2), csz);
                if (out_pts) out_pts[n_frames] = last_pts;
                n_frames++;
            }
            fb_index++;
        }
        if (!mode) last_pts = pts;
    }

    void picture(BitReader& r) {
        flush_picture();
        r.get(10);
        picture_coding_type = (int)r.get(3);
        if (picture_coding_type != I_FRAME && picture_coding_type != P_FRAME)
            return;
        r.get(16);
        if (picture_coding_type == P_FRAME) {
            full_pel_forward = (int)r.get(1);
            forward_r_size = (int)r.get(3) - 1;
        }
    }

    void reset_predictors() {
        y_dc = u_dc = v_dc = 128;
        fwd_h = fwd_v = 0;
    }

    void inc_mb() {
        mb_x += 1;
        while (mb_x >= mb_width) { mb_x -= mb_width; mb_y++; }
    }

    int motion_vector(BitReader& r, int m, int r_size) {
        int scale = 1 << r_size;
        int code = get_vlc(r, LUT_MOTION, 11);
        int d;
        if (code != 0 && scale != 1) {
            d = ((abs(code) - 1) << r_size) + (int)r.get(r_size) + 1;
            if (code < 0) d = -d;
        } else {
            d = code;
        }
        m += d;
        if (m > (scale << 4) - 1) m -= scale << 5;
        else if (m < (-scale) << 4) m += scale << 5;
        return m;
    }

    // Half-pel MC with exact (a+b+1)>>1 / (a+b+c+d+2)>>2 rounding.
    void mocomp(const uint8_t* src, uint8_t* dst, int stride, int pos_x,
                int pos_y, int size, int dst_x, int dst_y) {
        int xy = ((pos_y & 1) << 1) | (pos_x & 1);
        int x0 = pos_x >> 1, y0 = pos_y >> 1;
        for (int y = 0; y < size; y++) {
            const uint8_t* s0 = src + (size_t)(y0 + y) * stride + x0;
            const uint8_t* s1 = s0 + stride;
            uint8_t* d = dst + (size_t)(dst_y + y) * stride + dst_x;
            switch (xy) {
                case 0:
                    memcpy(d, s0, size);
                    break;
                case 1:
                    for (int x = 0; x < size; x++)
                        d[x] = (uint8_t)((s0[x] + s0[x + 1] + 1) >> 1);
                    break;
                case 2:
                    for (int x = 0; x < size; x++)
                        d[x] = (uint8_t)((s0[x] + s1[x] + 1) >> 1);
                    break;
                default:
                    for (int x = 0; x < size; x++)
                        d[x] = (uint8_t)((s0[x] + s0[x + 1] + s1[x] +
                                          s1[x + 1] + 2) >> 2);
            }
        }
    }

    void predict_zero() {
        int w = width, cw = width / 2;
        for (int y = 0; y < 16; y++)
            memcpy(cur(0) + (size_t)(mb_y * 16 + y) * w + mb_x * 16,
                   ref(0) + (size_t)(mb_y * 16 + y) * w + mb_x * 16, 16);
        for (int y = 0; y < 8; y++) {
            memcpy(cur(1) + (size_t)(mb_y * 8 + y) * cw + mb_x * 8,
                   ref(1) + (size_t)(mb_y * 8 + y) * cw + mb_x * 8, 8);
            memcpy(cur(2) + (size_t)(mb_y * 8 + y) * cw + mb_x * 8,
                   ref(2) + (size_t)(mb_y * 8 + y) * cw + mb_x * 8, 8);
        }
    }

    void predict() {
        int h = fwd_h, v = fwd_v;
        if (h == 0 && v == 0) { predict_zero(); return; }
        if (full_pel_forward) { h <<= 1; v <<= 1; }
        int x = (mb_x << 5) + h;
        int y = (mb_y << 5) + v;
        mocomp(ref(0), cur(0), width, x, y, 16, mb_x * 16, mb_y * 16);
        x >>= 1; y >>= 1;
        mocomp(ref(1), cur(1), width / 2, x, y, 8, mb_x * 8, mb_y * 8);
        mocomp(ref(2), cur(2), width / 2, x, y, 8, mb_x * 8, mb_y * 8);
    }

    // Fixed-point 8-point IDCT butterfly over one line of the block,
    // expressed with named DCT-coefficient inputs.  Same Q8 constants
    // (473 ~ sqrt2*cos(pi/8)<<8, 362 ~ sqrt2<<8, 196 ~ sqrt2*sin(pi/8)
    // <<8) and rounding as the scaled integer transform the reference
    // uses (player.cpp:922-996) -- the bit-exactness contract pins the
    // arithmetic, not the code shape.  `final_pass` applies the
    // (v + 128) >> 8 output descale of the second (row) pass.
    static void idct_line(int* p, int stride, bool final_pass) {
        const int c0 = p[0 * stride], c1 = p[1 * stride];
        const int c2 = p[2 * stride], c3 = p[3 * stride];
        const int c4 = p[4 * stride], c5 = p[5 * stride];
        const int c6 = p[6 * stride], c7 = p[7 * stride];

        // even part
        const int even26_sum = c2 + c6;
        const int even26_rot = ((c2 - c6) * 362 + 128) >> 8;
        const int dc_minus = c0 - c4, dc_plus = c0 + c4;
        // odd part
        const int odd17_sum = c1 + c7, odd17_dif = c1 - c7;
        const int odd35_sum = c3 + c5, odd53_dif = c5 - c3;
        const int odd_all = odd17_sum + odd35_sum;
        const int rot1 = ((odd17_dif * 473 - odd53_dif * 196 + 128) >> 8)
            - odd_all;
        const int rot2 = rot1 - (((odd17_sum - odd35_sum) * 362 + 128)
                                 >> 8);
        const int rot3 = -rot2 - ((odd53_dif * 473 + odd17_dif * 196
                                   + 128) >> 8);

        const int s0 = dc_plus + even26_sum;   // stage-2 sums
        const int s1 = dc_minus + (even26_rot - even26_sum);
        const int s2 = dc_minus - (even26_rot - even26_sum);
        const int s3 = dc_plus - even26_sum;

        int o[8];
        o[0] = odd_all + s0;
        o[1] = rot1 + s1;
        o[2] = s2 - rot2;
        o[3] = s3 - rot3;
        o[4] = s3 + rot3;
        o[5] = rot2 + s2;
        o[6] = s1 - rot1;
        o[7] = s0 - odd_all;
        for (int k = 0; k < 8; k++)
            p[k * stride] = final_pass ? ((o[k] + 128) >> 8) : o[k];
    }

    void idct(int* b) {
        for (int col = 0; col < 8; col++)
            idct_line(b + col, 8, false);      // columns, scaled
        for (int row = 0; row < 8; row++)
            idct_line(b + row * 8, 1, true);   // rows + descale
    }

    void block(BitReader& r, int blk, bool intra) {
        const int32_t* q = non_intra_q;
        int n = 0;
        int b[64];
        memset(b, 0, sizeof(b));

        if (intra) {
            int dc_size;
            if (blk < 4) {
                b[0] = y_dc;
                dc_size = get_vlc(r, LUT_DC_LUM, 8);
            } else {
                b[0] = blk == 4 ? u_dc : v_dc;
                dc_size = get_vlc(r, LUT_DC_CHROM, 8);
            }
            if (error) return;
            if (dc_size) {
                int delta = (int)r.get(dc_size);
                if (delta & (1 << (dc_size - 1))) b[0] += delta;
                else b[0] += ((-1 << dc_size) | (delta + 1));
                if (blk == 4) u_dc = b[0];
                else if (blk == 5) v_dc = b[0];
                else y_dc = b[0];
            }
            b[0] <<= 8;
            q = intra_q;
            n = 1;
        }

        for (;;) {
            uint32_t p = r.peek(2);
            if (n && p == 0x2) { r.skip(2); break; }
            const int32_t* lut = n == 0 ? LUT_DCT_FIRST : LUT_DCT_NEXT;
            int32_t e = lut[r.peek(17)];
            int kind = (e >> 24) & 3;
            if (kind == 0) { error = 3; return; }
            int bits = (e >> 18) & 0x1F;
            int run = (e >> 12) & 0x3F;
            int level = e & 0xFFF;
            if (level >= 0x800) level -= 0x1000;
            r.skip(bits);
            if (kind == DCT_ESC_K) {
                int v8 = (int)r.get(8);
                if (v8 == 0) level = (int)r.get(8);
                else if (v8 == 128) level = (int)r.get(8) - 256;
                else level = v8 > 128 ? v8 - 256 : v8;
            }
            n += run;
            if (n >= 64) { error = 4; return; }
            int zz = ZIG_ZAG[n++];
            // exact dequant (player.cpp:1110-1121); native C semantics.
            // Oddification maps a truncated-to-zero v to +1 (the
            // reference's `v -= v>0 ? 1 : -1`).  level==0 (malformed
            // escape) stays 0 to match the dense pipeline's
            // absent-coefficient representation.
            int v = level * 2;
            if (!intra) v += (v < 0 ? -1 : (v > 0 ? 1 : 0));
            v = (v * quantizer_scale * q[zz]) / 16;
            if ((v & 1) == 0 && level != 0) v -= v > 0 ? 1 : -1;
            if (v > 2047) v = 2047; else if (v < -2048) v = -2048;
            b[zz] = v * (int)SCALE_DCT_Q[zz];
        }

        int stride, dx, dy;
        uint8_t* plane;
        if (blk < 4) {
            plane = cur(0); stride = width;
            dx = mb_x * 16 + ((blk & 1) ? 8 : 0);
            dy = mb_y * 16 + ((blk & 2) ? 8 : 0);
        } else {
            plane = cur(blk == 4 ? 1 : 2); stride = width / 2;
            dx = mb_x * 8; dy = mb_y * 8;
        }

        if (n == 1) {
            int dc = b[0] >> 8;
            for (int y = 0; y < 8; y++) {
                uint8_t* d = plane + (size_t)(dy + y) * stride + dx;
                for (int x = 0; x < 8; x++)
                    d[x] = (uint8_t)pin248(intra ? dc : d[x] + dc);
            }
            return;
        }

        idct(b);
        for (int y = 0; y < 8; y++) {
            uint8_t* d = plane + (size_t)(dy + y) * stride + dx;
            for (int x = 0; x < 8; x++) {
                int v = b[y * 8 + x];
                d[x] = (uint8_t)pin248(intra ? v : d[x] + v);
            }
        }
    }

    bool slice_done(BitReader& r) { return r.peek(23) == 0; }

    int slice(BitReader& r, int s) {
        mb_y = s - 2;
        mb_x = mb_width - 1;
        if (mb_y >= mb_height) return -1;
        reset_predictors();
        quantizer_scale = (int)r.get(5);
        while (r.get(1)) r.get(8);

        for (int mb = 0; !slice_done(r) && !error; mb++) {
            int increment = 0;
            int i = get_vlc(r, LUT_MB_ADDR, 11);
            while (i == 34) i = get_vlc(r, LUT_MB_ADDR, 11);
            while (i == 35) { increment += 33; i = get_vlc(r, LUT_MB_ADDR, 11); }
            increment += i;
            if (error) return -1;

            if (mb == 0) {
                inc_mb();  // reference ignores the count on the first MB
            } else {
                if (increment > 1) reset_predictors();
                while (increment > 1) { inc_mb(); predict_zero(); increment--; }
                inc_mb();
            }

            int mb_type = get_vlc(
                r, picture_coding_type == I_FRAME ? LUT_MB_TYPE_I
                                                  : LUT_MB_TYPE_P, 6);
            bool intra = mb_type & MBT_INTRA;
            if (mb_type & MBT_QUANT) quantizer_scale = (int)r.get(5);

            if (intra) {
                fwd_h = fwd_v = 0;
            } else {
                y_dc = u_dc = v_dc = 128;
                if (mb_type & MBT_MOTION_F) {
                    fwd_h = motion_vector(r, fwd_h, forward_r_size);
                    fwd_v = motion_vector(r, fwd_v, forward_r_size);
                } else {
                    fwd_h = fwd_v = 0;
                }
                predict();
            }

            int cbp = (mb_type & MBT_PATTERN) ? get_vlc(r, LUT_CBP, 9)
                                              : (intra ? 63 : 0);
            int mask = 0x20;
            for (int k = 0; k < 6; k++) {
                if (cbp & mask) block(r, k, intra);
                if (error) return -1;
                mask >>= 1;
            }
        }
        return 0;
    }

    int run(const uint8_t* es, long es_len) {
        BitReader r{es, es_len, 0};
        long long npic = 0;
        while (r.pos < 8 * es_len && !error) {
            while (r.peek(24) == 0) {
                r.skip(1);
                if (r.pos >= 8 * es_len) goto done;
            }
            if (r.peek(24) != 1) { r.skip(8); continue; }
            r.skip(24);
            int m = (int)r.get(8);
            if (m == 0xB3) sequence(r);
            else if (m == 0xB8) { r.get(25); r.get(7); }
            else if (m == 0x00) { pts = npic++; picture(r); }
            else if (m == 0xB7) break;
            else if (m == 0xB2 || m == 0xB5) {}
            else if (m >= 0x01 && m <= 0xAF) slice(r, m);
            else { error = 1; }
        }
    done:
        flush_picture();  // present the final pending picture
        return error ? -error : n_frames;
    }
};

}  // namespace

namespace {

// ---------------------------------------------------------------------
// Slice tokenizer: entropy-decode ONE picture's slice payload into the
// same dense buffers the device scanner produces (raw levels at raster
// positions, packed MB records, per-block final-n), leaving dequant/
// IDCT/mocomp to the batched device kernels.  This is the native
// runtime fast path of the hybrid pipeline (see docs/ARCHITECTURE.md).
struct Tokenizer {
    int mb_width, mb_height, mb_count;
    int pic_type, full_pel, r_size;
    int quantizer_scale = 0;
    int mb_x = 0, mb_y = 0;
    int y_dc = 128, u_dc = 128, v_dc = 128;
    int fwd_h = 0, fwd_v = 0;
    int16_t* coeffs;    // [mb_count*384] (dense mode)
    int32_t* recs;      // [mb_count]
    uint8_t* nfinal;    // [mb_count*6]
    int32_t* emit = nullptr;  // compact mode: (pos<<12 | val&0xFFF)
    int max_emit = 0;
    int n_emit = 0;
    int error = 0;

    void put_coeff(int pos, int val) {
        if (emit) {
            if (n_emit >= max_emit) { error = 5; return; }
            emit[n_emit++] = (pos << 12) | (val & 0xFFF);
        } else {
            coeffs[pos] = (int16_t)val;
        }
    }

    int get_vlc(BitReader& r, const int32_t* lut, int peek_bits) {
        int32_t e = lut[r.peek(peek_bits)];
        if (e == 0) { error = 2; return 0; }
        r.skip(lut_length(e));
        return lut_value(e);
    }

    void inc_mb() {
        mb_x += 1;
        while (mb_x >= mb_width) { mb_x -= mb_width; mb_y++; }
    }

    int mb_index() {
        int i = mb_y * mb_width + mb_x;
        return i < 0 ? 0 : (i >= mb_count ? mb_count - 1 : i);
    }

    int motion_vector(BitReader& r, int m) {
        int scale = 1 << r_size;
        int code = get_vlc(r, LUT_MOTION, 11);
        int d;
        if (code != 0 && scale != 1) {
            d = ((abs(code) - 1) << r_size) + (int)r.get(r_size) + 1;
            if (code < 0) d = -d;
        } else d = code;
        m += d;
        if (m > (scale << 4) - 1) m -= scale << 5;
        else if (m < (-scale) << 4) m += scale << 5;
        return m;
    }

    void block(BitReader& r, int blk, bool intra) {
        int base = mb_index() * 384 + blk * 64;
        int n = 0;
        if (intra) {
            int dc_size = blk < 4 ? get_vlc(r, LUT_DC_LUM, 8)
                                  : get_vlc(r, LUT_DC_CHROM, 8);
            if (error) return;
            int* pred = blk < 4 ? &y_dc : (blk == 4 ? &u_dc : &v_dc);
            int dc = *pred;
            if (dc_size) {
                int delta = (int)r.get(dc_size);
                if (delta & (1 << (dc_size - 1))) dc += delta;
                else dc += ((-1 << dc_size) | (delta + 1));
                *pred = dc;
            }
            put_coeff(base, dc);
            n = 1;
        }
        for (;;) {
            uint32_t p = r.peek(2);
            if (n && p == 0x2) { r.skip(2); break; }
            const int32_t* lut = n == 0 ? LUT_DCT_FIRST : LUT_DCT_NEXT;
            int32_t e = lut[r.peek(17)];
            int kind = (e >> 24) & 3;
            if (kind == 0) { error = 3; return; }
            int bits = (e >> 18) & 0x1F;
            int run = (e >> 12) & 0x3F;
            int level = e & 0xFFF;
            if (level >= 0x800) level -= 0x1000;
            r.skip(bits);
            if (kind == DCT_ESC_K) {
                int v8 = (int)r.get(8);
                if (v8 == 0) level = (int)r.get(8);
                else if (v8 == 128) level = (int)r.get(8) - 256;
                else level = v8 > 128 ? v8 - 256 : v8;
            }
            n += run;
            if (n >= 64) { error = 4; return; }
            put_coeff(base + ZIG_ZAG[n++], level);
        }
        nfinal[(size_t)mb_index() * 6 + blk] = (uint8_t)n;
    }

    void emit_rec(int kind, int mvh_eff, int mvv_eff) {
        recs[mb_index()] = kind | (quantizer_scale << 2)
            | ((mvh_eff & 0xFFF) << 7) | ((mvv_eff & 0xFFF) << 19);
    }

    int slice(BitReader& r, int s) {
        mb_y = s - 2;
        mb_x = mb_width - 1;
        if (mb_y >= mb_height) return -1;
        y_dc = u_dc = v_dc = 128;
        fwd_h = fwd_v = 0;
        quantizer_scale = (int)r.get(5);
        while (r.get(1)) r.get(8);
        for (int mb = 0; r.peek(23) != 0 && !error; mb++) {
            int increment = 0;
            int i = get_vlc(r, LUT_MB_ADDR, 11);
            while (i == 34) i = get_vlc(r, LUT_MB_ADDR, 11);
            while (i == 35) { increment += 33; i = get_vlc(r, LUT_MB_ADDR, 11); }
            increment += i;
            if (error) return -1;
            if (mb == 0) inc_mb();
            else {
                if (increment > 1) {
                    y_dc = u_dc = v_dc = 128;
                    fwd_h = fwd_v = 0;
                }
                while (increment > 1) {
                    inc_mb();
                    recs[mb_index()] = 1;  // MB_SKIP
                    increment--;
                }
                inc_mb();
            }
            int mb_type = get_vlc(
                r, pic_type == 1 ? LUT_MB_TYPE_I : LUT_MB_TYPE_P, 6);
            bool intra = mb_type & MBT_INTRA;
            if (mb_type & MBT_QUANT) quantizer_scale = (int)r.get(5);
            if (intra) {
                fwd_h = fwd_v = 0;
                emit_rec(3, 0, 0);
            } else {
                y_dc = u_dc = v_dc = 128;
                if (mb_type & MBT_MOTION_F) {
                    fwd_h = motion_vector(r, fwd_h);
                    fwd_v = motion_vector(r, fwd_v);
                } else fwd_h = fwd_v = 0;
                emit_rec(2, fwd_h << full_pel, fwd_v << full_pel);
            }
            int cbp = (mb_type & MBT_PATTERN) ? get_vlc(r, LUT_CBP, 9)
                                              : (intra ? 63 : 0);
            for (int k = 0, mask = 0x20; k < 6; k++, mask >>= 1)
                if (cbp & mask) {
                    block(r, k, intra);
                    if (error) return -1;
                }
        }
        return 0;
    }
};

}  // namespace

extern "C" {

// Decode a whole MPEG-1 video elementary stream.
// Returns frame count, or -errno on parse error.
int mpeg1_oracle_decode(const uint8_t* es, long es_len,
                        uint8_t* out_y, uint8_t* out_u, uint8_t* out_v,
                        long long* out_pts, int max_frames,
                        int* out_width, int* out_height) {
    Decoder d;
    d.out_y = out_y; d.out_u = out_u; d.out_v = out_v;
    d.out_pts = out_pts;
    d.max_frames = max_frames;
    int n = d.run(es, es_len);
    if (out_width) *out_width = d.width;
    if (out_height) *out_height = d.height;
    return n;
}

// Tokenize one picture's slice payload (native fast path).
// payload: slice region incl. start codes; slice offsets in BITS from
// payload start (past each 32-bit start code), rows 0-based.
// Outputs must be zeroed by the caller: coeffs[mb_count*384] int16,
// recs[mb_count] int32, nfinal[mb_count*6] uint8.
// Returns 0, or -errno on parse error (partial outputs retained).
int mpeg1_tokenize_picture(const uint8_t* payload, long payload_len,
                           const long* slice_bit_offsets,
                           const int* slice_rows, int n_slices,
                           int mb_width, int mb_height,
                           int pic_type, int full_pel, int r_size,
                           int16_t* coeffs, int32_t* recs,
                           uint8_t* nfinal) {
    Tokenizer t;
    t.mb_width = mb_width;
    t.mb_height = mb_height;
    t.mb_count = mb_width * mb_height;
    t.pic_type = pic_type;
    t.full_pel = full_pel;
    t.r_size = r_size < 0 ? 0 : r_size;
    t.coeffs = coeffs;
    t.recs = recs;
    t.nfinal = nfinal;
    for (int s = 0; s < n_slices && !t.error; s++) {
        BitReader r{payload, payload_len, slice_bit_offsets[s]};
        t.slice(r, slice_rows[s] + 1);
    }
    return t.error ? -t.error : 0;
}

// Compact variant: coefficients as an emission list of
// (coeff_pos << 12 | level & 0xFFF) words (4x less host->device
// transfer than the dense buffer; the device unpacks with one bulk
// scatter).  Returns the emission count, or -errno.
int mpeg1_tokenize_picture_compact(
        const uint8_t* payload, long payload_len,
        const long* slice_bit_offsets, const int* slice_rows,
        int n_slices, int mb_width, int mb_height,
        int pic_type, int full_pel, int r_size,
        int32_t* emit, int max_emit, int32_t* recs, uint8_t* nfinal) {
    Tokenizer t;
    t.mb_width = mb_width;
    t.mb_height = mb_height;
    t.mb_count = mb_width * mb_height;
    t.pic_type = pic_type;
    t.full_pel = full_pel;
    t.r_size = r_size < 0 ? 0 : r_size;
    t.coeffs = nullptr;
    t.recs = recs;
    t.nfinal = nfinal;
    t.emit = emit;
    t.max_emit = max_emit;
    for (int s = 0; s < n_slices && !t.error; s++) {
        BitReader r{payload, payload_len, slice_bit_offsets[s]};
        t.slice(r, slice_rows[s] + 1);
    }
    return t.error ? -t.error : t.n_emit;
}

}  // extern "C"
