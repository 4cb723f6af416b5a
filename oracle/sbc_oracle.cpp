// SBC oracle decoder (clean-room, native C++).
//
// Golden PCM generator implementing the A2DP SBC subset with the exact
// fixed-point semantics of the reference decoder
// (/root/reference/src/sbc_decoder.cpp): 8 subbands, mono/dual-channel,
// loudness/SNR allocation, Q16 cosine/prototype tables, >>15 stages,
// +-0x7FFF clip.  Built with -fwrapv so int32 overflow is defined
// wraparound on all paths.

#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <math.h>

namespace {

static const int8_t OFFSET8[4][8] = {
    {-2, 0, 0, 0, 0, 0, 0, 1},
    {-3, 0, 0, 0, 0, 0, 1, 2},
    {-4, 0, 0, 0, 0, 0, 1, 2},
    {-4, 0, 0, 0, 0, 0, 1, 2},
};

// Q16 tables generated at startup from the spec formulas (the prototype
// is transcribed; see espflix_tpu/core/sbc_tables.py).
static int32_t SYN8[16][8];
static const int32_t PROTO8[8][10] = {
    {0, -528, -1484, -3392, -17826, -38524, 17825, -3392, 1483, -528},
    {-42, -552, -2105, -2322, -21754, -38114, 13942, -4016, 916, -468},
    {-90, -523, -2742, -767, -25579, -36898, 10243, -4253, 432, -388},
    {-146, -424, -3342, 1288, -29150, -34935, 6844, -4170, 46, -299},
    {-216, -237, -3842, 3837, -32314, -32314, 3837, -3842, -237, -216},
    {-299, 46, -4170, 6844, -34935, -29150, 1288, -3342, -424, -146},
    {-388, 432, -4253, 10243, -36898, -25579, -767, -2742, -523, -90},
    {-468, 916, -4016, 13942, -38114, -21754, -2322, -2105, -552, -42},
};

static void init_tables() {
    static bool done = false;
    if (done) return;
    for (int k = 0; k < 16; k++)
        for (int i = 0; i < 8; i++) {
            double x = cos((i + 0.5) * (k + 4) * M_PI / 8);
            SYN8[k][i] = fabs(x) < 1e-9 ? 0 : (int32_t)floor(65536.0 * x);
        }
    done = true;
}

struct SbcCtx {
    int32_t v[2][170];
    int32_t v_offset[2][16];
};

static void bit_allocation(const int sf[2][8], int bitpool, int channels,
                           int frequency, int allocation, int bits[2][8]) {
    for (int ch = 0; ch < channels; ch++) {
        int bitneed[8];
        int max_bitneed = 0;
        for (int sb = 0; sb < 8; sb++) {
            if (allocation) {
                bitneed[sb] = sf[ch][sb];
            } else if (sf[ch][sb] == 0) {
                bitneed[sb] = -5;
            } else {
                int loud = sf[ch][sb] - OFFSET8[frequency][sb];
                if (loud > 0) loud /= 2;
                bitneed[sb] = loud;
            }
            if (bitneed[sb] > max_bitneed) max_bitneed = bitneed[sb];
        }
        int bitcount = 0, slicecount = 0, bitslice = max_bitneed + 1;
        do {
            bitslice--;
            bitcount += slicecount;
            slicecount = 0;
            for (int sb = 0; sb < 8; sb++) {
                if (bitneed[sb] > bitslice + 1 && bitneed[sb] < bitslice + 16)
                    slicecount++;
                else if (bitneed[sb] == bitslice + 1)
                    slicecount += 2;
            }
        } while (bitcount + slicecount < bitpool);
        if (bitcount + slicecount == bitpool) {
            bitcount += slicecount;
            bitslice--;
        }
        for (int sb = 0; sb < 8; sb++) {
            if (bitneed[sb] < bitslice + 2) bits[ch][sb] = 0;
            else {
                bits[ch][sb] = bitneed[sb] - bitslice;
                if (bits[ch][sb] > 16) bits[ch][sb] = 16;
            }
        }
        for (int sb = 0; bitcount < bitpool && sb < 8; sb++) {
            if (bits[ch][sb] >= 2 && bits[ch][sb] < 16) {
                bits[ch][sb]++;
                bitcount++;
            } else if (bitneed[sb] == bitslice + 1 && bitpool > bitcount + 1) {
                bits[ch][sb] = 2;
                bitcount += 2;
            }
        }
        for (int sb = 0; bitcount < bitpool && sb < 8; sb++) {
            if (bits[ch][sb] < 16) {
                bits[ch][sb]++;
                bitcount++;
            }
        }
    }
}

}  // namespace

extern "C" {

void* sbc_oracle_new() {
    init_tables();
    SbcCtx* c = (SbcCtx*)calloc(1, sizeof(SbcCtx));
    for (int ch = 0; ch < 2; ch++)
        for (int i = 0; i < 16; i++)
            c->v_offset[ch][i] = (i + 1) * 10;
    return c;
}

void sbc_oracle_free(void* ctx) { free(ctx); }

// Decode one frame. Returns frame length in bytes, -1 on bad/unsupported
// header. pcm receives channels*blocks*8 samples (per-channel runs
// sequential, matching the reference layout); *n_samples set.
int sbc_oracle_decode(void* vctx, const uint8_t* data, long len,
                      int16_t* pcm, int* n_samples) {
    SbcCtx* ctx = (SbcCtx*)vctx;
    if (len < 4 || data[0] != 0x9C) return -1;
    int frequency = (data[1] >> 6) & 3;
    static const uint8_t BLOCKMODE[4] = {4, 8, 12, 16};
    int blocks = BLOCKMODE[(data[1] >> 4) & 3];
    int mode = (data[1] >> 2) & 3;
    int channels = mode == 0 ? 1 : 2;
    int allocation = (data[1] >> 1) & 1;
    int subbands = (data[1] & 1) ? 8 : 4;
    int bitpool = data[2];
    if (mode == 3 || subbands == 4) return -1;

    int sf[2][8] = {{0}};
    int p = 4;
    for (int ch = 0; ch < channels; ch++)
        for (int sb = 0; sb < 8; sb += 2) {
            uint8_t a = data[p++];
            sf[ch][sb] = a >> 4;
            sf[ch][sb + 1] = a & 0xF;
        }
    int bits[2][8] = {{0}};
    bit_allocation(sf, bitpool, channels, frequency, allocation, bits);

    // unpack quantized samples
    int32_t sb_sample[16][2][8];
    memset(sb_sample, 0, sizeof(sb_sample));
    long bpos = 0;
    for (int blk = 0; blk < blocks; blk++)
        for (int ch = 0; ch < channels; ch++)
            for (int sb = 0; sb < 8; sb++) {
                int level = bits[ch][sb];
                if (!level) continue;
                int32_t raw = 0;
                for (int i = 0; i < level; i++) {
                    raw = (raw << 1) |
                          ((data[p + (bpos >> 3)] >> (7 - (bpos & 7))) & 1);
                    bpos++;
                }
                int scale = sf[ch][sb];
                int32_t s = ((raw << 1) | 1);
                s = (int32_t)(((int64_t)s << scale) / ((1 << level) - 1));
                sb_sample[blk][ch][sb] = s - (1 << scale);
            }
    int frame_len = p + (int)((bpos + 7) >> 3);

    // synthesis
    int16_t* out = pcm;
    for (int ch = 0; ch < channels; ch++) {
        int32_t* v = ctx->v[ch];
        int32_t* offset = ctx->v_offset[ch];
        for (int blk = 0; blk < blocks; blk++) {
            const int32_t* src = sb_sample[blk][ch];
            for (int i = 0; i < 16; i++) {
                if (!offset[i]) {
                    for (int j = 0; j < 9; j++) v[j + 160] = v[j];
                    offset[i] = 160;
                }
                int k = --offset[i];
                int32_t s = 0;
                for (int j = 0; j < 8; j++) s += SYN8[i][j] * src[j];
                v[k] = s >> 15;
            }
            for (int i = 0; i < 8; i++) {
                int32_t* p0 = v + offset[i];
                int32_t* p1 = v + offset[(i + 8) & 0xF] + 1;
                int32_t s = 0;
                for (int j = 0; j < 10; j += 2) {
                    s += p0[j] * PROTO8[i][j];
                    s += p1[j] * PROTO8[i][j + 1];
                }
                s >>= 15;
                if (s < -0x7FFF) s = -0x7FFF;
                else if (s > 0x7FFF) s = 0x7FFF;
                *out++ = (int16_t)s;
            }
        }
    }
    if (n_samples) *n_samples = blocks * 8 * channels;
    return frame_len;
}

}  // extern "C"
