// BC6H (BPTC float) block decoder — native component of raytracedggx_tpu.
//
// Fills the role of the reference's binary-only DDS loader
// (XUSG DDS::Loader::CreateTextureFromFile, XUSGAdvanced.h:62-79) for the
// BC6H_UF16 environment probes (Bin/Assets/*_cross.dds, DXGI format 95).
//
// Implements the D3D11 functional spec for BC6H: 14 modes, two-region
// partitions (first 32 entries of the BPTC 2-subset table), delta-compressed
// endpoints, 17-bit unquantized interpolation, half-float output.
// Validated against an independent decoder by block fuzzing (tests).
//
// Exported C ABI (ctypes):
//   void bc6h_decode(const uint8_t* blocks, int64_t num_blocks,
//                    int is_signed, uint16_t* out_halfs /* nb*16*3 */);

#include <cstdint>
#include <cstring>

namespace {

// ---- bit reader over a 128-bit block ------------------------------------
struct BitReader {
    const uint8_t* p;
    int pos = 0;
    explicit BitReader(const uint8_t* block) : p(block) {}
    uint32_t read(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; ++i) {
            v |= static_cast<uint32_t>((p[pos >> 3] >> (pos & 7)) & 1) << i;
            ++pos;
        }
        return v;
    }
};

// ---- per-mode endpoint bit layout ----------------------------------------
// Fields: channel 0..2 (r,g,b), endpoint 0..3 (w=A0, x=B0, y=A1, z=B1),
// starting bit within that endpoint value, count (consumed LSB-first from
// the stream), optional reversed flag (stream supplies MSB..LSB).
struct Field { uint8_t ch, ep, start, count, rev; };

#define F(ch, ep, start, count) {ch, ep, start, count, 0}
#define FR(ch, ep, start, count) {ch, ep, start, count, 1}
// channel ids
enum { R = 0, G = 1, B = 2 };
// endpoint ids
enum { W = 0, X = 1, Y = 2, Z = 3 };

struct ModeDesc {
    int header_bits;     // mode bits consumed before fields
    int epb[3];          // endpoint precision (r,g,b share in BC6H)
    bool transformed;    // delta endpoints
    bool two_region;
    int num_fields;
    Field fields[40];
};

// Layouts transcribed from the D3D11 functional spec BC6H table.
static const ModeDesc kModes[14] = {
    // mode 1: 2-bit header 00, 10.555
    {2, {10,10,10}, true, true, 25, {
        F(G,Y,4,1), F(B,Y,4,1), F(B,Z,4,1),
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,5), F(G,Z,4,1), F(G,Y,0,4), F(G,X,0,5), F(B,Z,0,1),
        F(G,Z,0,4), F(B,X,0,5), F(B,Z,1,1), F(B,Y,0,4), F(R,Y,0,5),
        F(B,Z,2,1), F(R,Z,0,5), F(B,Z,3,1)}},
    // mode 2: 01, 7.666
    {2, {7,7,7}, true, true, 25, {
        F(G,Y,5,1), F(G,Z,4,1), F(G,Z,5,1),
        F(R,W,0,7), F(B,Z,0,1), F(B,Z,1,1), F(B,Y,4,1),
        F(G,W,0,7), F(B,Y,5,1), F(B,Z,2,1), F(G,Y,4,1),
        F(B,W,0,7), F(B,Z,3,1), F(B,Z,5,1), F(B,Z,4,1),
        F(R,X,0,6), F(G,Y,0,4), F(G,X,0,6), F(G,Z,0,4), F(B,X,0,6),
        F(B,Y,0,4), F(R,Y,0,6), F(R,Z,0,6)}},
    // mode 3: 00010, 11.544
    {5, {11,11,11}, true, true, 22, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,5), F(R,W,10,1), F(G,Y,0,4), F(G,X,0,4), F(G,W,10,1),
        F(B,Z,0,1), F(G,Z,0,4), F(B,X,0,4), F(B,W,10,1), F(B,Z,1,1),
        F(B,Y,0,4), F(R,Y,0,5), F(B,Z,2,1), F(R,Z,0,5), F(B,Z,3,1)}},
    // mode 4: 00110, 11.454
    {5, {11,11,11}, true, true, 24, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,4), F(R,W,10,1), F(G,Z,4,1), F(G,Y,0,4), F(G,X,0,5),
        F(G,W,10,1), F(G,Z,0,4), F(B,X,0,4), F(B,W,10,1), F(B,Z,1,1),
        F(B,Y,0,4), F(R,Y,0,4), F(B,Z,0,1), F(B,Z,2,1), F(R,Z,0,4),
        F(G,Y,4,1), F(B,Z,3,1)}},
    // mode 5: 01010, 11.445
    {5, {11,11,11}, true, true, 24, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,4), F(R,W,10,1), F(B,Y,4,1), F(G,Y,0,4), F(G,X,0,4),
        F(G,W,10,1), F(B,Z,0,1), F(G,Z,0,4), F(B,X,0,5), F(B,W,10,1),
        F(B,Y,0,4), F(R,Y,0,4), F(B,Z,1,1), F(B,Z,2,1), F(R,Z,0,4),
        F(B,Z,4,1), F(B,Z,3,1)}},
    // mode 6: 01110, 9.555
    {5, {9,9,9}, true, true, 22, {
        F(R,W,0,9), F(B,Y,4,1), F(G,W,0,9), F(G,Y,4,1), F(B,W,0,9),
        F(B,Z,4,1), F(R,X,0,5), F(G,Z,4,1), F(G,Y,0,4), F(G,X,0,5),
        F(B,Z,0,1), F(G,Z,0,4), F(B,X,0,5), F(B,Z,1,1), F(B,Y,0,4),
        F(R,Y,0,5), F(B,Z,2,1), F(R,Z,0,5), F(B,Z,3,1)}},
    // mode 7: 10010, 8.655
    {5, {8,8,8}, true, true, 21, {
        F(R,W,0,8), F(G,Z,4,1), F(B,Y,4,1), F(G,W,0,8), F(B,Z,2,1),
        F(G,Y,4,1), F(B,W,0,8), F(B,Z,3,1), F(B,Z,4,1), F(R,X,0,6),
        F(G,Y,0,4), F(G,X,0,5), F(B,Z,0,1), F(G,Z,0,4), F(B,X,0,5),
        F(B,Z,1,1), F(B,Y,0,4), F(R,Y,0,6), F(R,Z,0,6)}},
    // mode 8: 10110, 8.565
    {5, {8,8,8}, true, true, 23, {
        F(R,W,0,8), F(B,Z,0,1), F(B,Y,4,1), F(G,W,0,8), F(G,Y,5,1),
        F(G,Y,4,1), F(B,W,0,8), F(G,Z,5,1), F(B,Z,4,1), F(R,X,0,5),
        F(G,Z,4,1), F(G,Y,0,4), F(G,X,0,6), F(G,Z,0,4), F(B,X,0,5),
        F(B,Z,1,1), F(B,Y,0,4), F(R,Y,0,5), F(B,Z,2,1), F(R,Z,0,5),
        F(B,Z,3,1)}},
    // mode 9: 11010, 8.556
    {5, {8,8,8}, true, true, 23, {
        F(R,W,0,8), F(B,Z,1,1), F(B,Y,4,1), F(G,W,0,8), F(B,Y,5,1),
        F(G,Y,4,1), F(B,W,0,8), F(B,Z,5,1), F(B,Z,4,1), F(R,X,0,5),
        F(G,Z,4,1), F(G,Y,0,4), F(G,X,0,5), F(B,Z,0,1), F(G,Z,0,4),
        F(B,X,0,6), F(B,Y,0,4), F(R,Y,0,5), F(B,Z,2,1), F(R,Z,0,5),
        F(B,Z,3,1)}},
    // mode 10: 11110, 6.666, not transformed
    {5, {6,6,6}, false, true, 26, {
        F(R,W,0,6), F(G,Z,4,1), F(B,Z,0,1), F(B,Z,1,1), F(B,Y,4,1),
        F(G,W,0,6), F(G,Y,5,1), F(B,Y,5,1), F(B,Z,2,1), F(G,Y,4,1),
        F(B,W,0,6), F(G,Z,5,1), F(B,Z,3,1), F(B,Z,5,1), F(B,Z,4,1),
        F(R,X,0,6), F(G,Y,0,4), F(G,X,0,6), F(G,Z,0,4), F(B,X,0,6),
        F(B,Y,0,4), F(R,Y,0,6), F(R,Z,0,6)}},
    // mode 11: 00011, one region 10.10, not transformed
    {5, {10,10,10}, false, false, 6, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,10), F(G,X,0,10), F(B,X,0,10)}},
    // mode 12: 00111, 11.9
    {5, {11,11,11}, true, false, 9, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,9), F(R,W,10,1), F(G,X,0,9), F(G,W,10,1),
        F(B,X,0,9), F(B,W,10,1)}},
    // mode 13: 01011, 12.8
    {5, {12,12,12}, true, false, 9, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,8), FR(R,W,10,2), F(G,X,0,8), FR(G,W,10,2),
        F(B,X,0,8), FR(B,W,10,2)}},
    // mode 14: 01111, 16.4
    {5, {16,16,16}, true, false, 9, {
        F(R,W,0,10), F(G,W,0,10), F(B,W,0,10),
        F(R,X,0,4), FR(R,W,10,6), F(G,X,0,4), FR(G,W,10,6),
        F(B,X,0,4), FR(B,W,10,6)}},
};

// mode bits -> kModes index (-1 = reserved/invalid)
static int mode_index(BitReader& br) {
    uint32_t m2 = br.read(2);
    if (m2 == 0) return 0;
    if (m2 == 1) return 1;
    uint32_t m5 = m2 | (br.read(3) << 2);
    switch (m5) {
        case 0x02: return 2;  case 0x06: return 3;  case 0x0A: return 4;
        case 0x0E: return 5;  case 0x12: return 6;  case 0x16: return 7;
        case 0x1A: return 8;  case 0x1E: return 9;  case 0x03: return 10;
        case 0x07: return 11; case 0x0B: return 12; case 0x0F: return 13;
        default: return -1;
    }
}

// ---- BPTC 2-subset partition table (first 32, used by BC6H) --------------
static const uint8_t kPartitions2[32][16] = {
    {0,0,1,1, 0,0,1,1, 0,0,1,1, 0,0,1,1},
    {0,0,0,1, 0,0,0,1, 0,0,0,1, 0,0,0,1},
    {0,1,1,1, 0,1,1,1, 0,1,1,1, 0,1,1,1},
    {0,0,0,1, 0,0,1,1, 0,0,1,1, 0,1,1,1},
    {0,0,0,0, 0,0,0,1, 0,0,0,1, 0,0,1,1},
    {0,0,1,1, 0,1,1,1, 0,1,1,1, 1,1,1,1},
    {0,0,0,1, 0,0,1,1, 0,1,1,1, 1,1,1,1},
    {0,0,0,0, 0,0,0,1, 0,0,1,1, 0,1,1,1},
    {0,0,0,0, 0,0,0,0, 0,0,0,1, 0,0,1,1},
    {0,0,1,1, 0,1,1,1, 1,1,1,1, 1,1,1,1},
    {0,0,0,0, 0,0,0,1, 0,1,1,1, 1,1,1,1},
    {0,0,0,0, 0,0,0,0, 0,0,0,1, 0,1,1,1},
    {0,0,0,1, 0,1,1,1, 1,1,1,1, 1,1,1,1},
    {0,0,0,0, 0,0,0,0, 1,1,1,1, 1,1,1,1},
    {0,0,0,0, 1,1,1,1, 1,1,1,1, 1,1,1,1},
    {0,0,0,0, 0,0,0,0, 0,0,0,0, 1,1,1,1},
    {0,0,0,0, 1,0,0,0, 1,1,1,0, 1,1,1,1},
    {0,1,1,1, 0,0,0,1, 0,0,0,0, 0,0,0,0},
    {0,0,0,0, 0,0,0,0, 1,0,0,0, 1,1,1,0},
    {0,1,1,1, 0,0,1,1, 0,0,0,1, 0,0,0,0},
    {0,0,1,1, 0,0,0,1, 0,0,0,0, 0,0,0,0},
    {0,0,0,0, 1,0,0,0, 1,1,0,0, 1,1,1,0},
    {0,0,0,0, 0,0,0,0, 1,0,0,0, 1,1,0,0},
    {0,1,1,1, 0,0,1,1, 0,0,1,1, 0,0,0,1},
    {0,0,1,1, 0,0,0,1, 0,0,0,1, 0,0,0,0},
    {0,0,0,0, 1,0,0,0, 1,0,0,0, 1,1,0,0},
    {0,1,1,0, 0,1,1,0, 0,1,1,0, 0,1,1,0},
    {0,0,1,1, 0,1,1,0, 0,1,1,0, 1,1,0,0},
    {0,0,0,1, 0,1,1,1, 1,1,1,0, 1,0,0,0},
    {0,0,0,0, 1,1,1,1, 1,1,1,1, 0,0,0,0},
    {0,1,1,1, 0,0,0,1, 1,0,0,0, 1,1,1,0},
    {0,0,1,1, 1,0,0,1, 1,0,0,1, 1,1,0,0},
};

static const uint8_t kFixUp2[32] = {
    15,15,15,15,15,15,15,15,
    15,15,15,15,15,15,15,15,
    15, 2, 8, 2, 2, 8, 8,15,
     2, 8, 2, 2, 8, 8, 2, 2,
};

static const int kWeights3[8] = {0, 9, 18, 27, 37, 46, 55, 64};
static const int kWeights4[16] = {0, 4, 9, 13, 17, 21, 26, 30,
                                  34, 38, 43, 47, 51, 55, 60, 64};

static int sign_extend(uint32_t v, int bits) {
    uint32_t sign = 1u << (bits - 1);
    return static_cast<int>((v ^ sign)) - static_cast<int>(sign);
}

static int unquantize_u(int comp, int epb) {
    if (epb >= 15) return comp;
    if (comp == 0) return 0;
    if (comp == ((1 << epb) - 1)) return 0xFFFF;
    return ((comp << 16) + 0x8000) >> epb;
}

static int unquantize_s(int comp, int epb) {
    if (epb >= 16) return comp;
    bool neg = comp < 0;
    if (neg) comp = -comp;
    int unq;
    if (comp == 0) unq = 0;
    else if (comp >= ((1 << (epb - 1)) - 1)) unq = 0x7FFF;
    else unq = ((comp << 15) + 0x4000) >> (epb - 1);
    return neg ? -unq : unq;
}

static uint16_t finish_u(int comp) {
    return static_cast<uint16_t>((comp * 31) >> 6);  // scale to half bits
}

static uint16_t finish_s(int comp) {
    comp = (comp < 0) ? -(((-comp) * 31) >> 5) : (comp * 31) >> 5;
    uint16_t s = 0;
    if (comp < 0) { s = 0x8000; comp = -comp; }
    return static_cast<uint16_t>(s | comp);
}

static void decode_block(const uint8_t* block, bool is_signed,
                         uint16_t* out /* 16*3 */) {
    BitReader br(block);
    int mi = mode_index(br);
    if (mi < 0) {
        std::memset(out, 0, 16 * 3 * sizeof(uint16_t));
        return;
    }
    const ModeDesc& md = kModes[mi];

    int ep[3][4] = {{0}};  // [channel][endpoint]
    for (int f = 0; f < md.num_fields; ++f) {
        const Field& fd = md.fields[f];
        uint32_t v = br.read(fd.count);
        if (fd.rev) {  // stream has MSB..LSB of this span
            uint32_t r = 0;
            for (int i = 0; i < fd.count; ++i)
                r |= ((v >> i) & 1u) << (fd.count - 1 - i);
            v = r;
        }
        ep[fd.ch][fd.ep] |= static_cast<int>(v) << fd.start;
    }

    int partition = 0;
    if (md.two_region) partition = static_cast<int>(br.read(5));

    int num_ep = md.two_region ? 4 : 2;
    int epb = md.epb[0];

    // sign extension: anchor signed iff format signed; deltas always signed
    if (is_signed)
        for (int c = 0; c < 3; ++c)
            ep[c][W] = sign_extend(static_cast<uint32_t>(ep[c][W]), epb);
    // delta widths differ per channel/endpoint: infer each endpoint's
    // assembled width from the layout fields, then sign-extend
    if (md.transformed) {
        int width[3][4] = {{0}};
        for (int f = 0; f < md.num_fields; ++f) {
            const Field& fd = md.fields[f];
            int w = fd.start + fd.count;
            if (w > width[fd.ch][fd.ep]) width[fd.ch][fd.ep] = w;
        }
        for (int c = 0; c < 3; ++c)
            for (int e = 1; e < num_ep; ++e) {
                int d = sign_extend(static_cast<uint32_t>(ep[c][e]),
                                    width[c][e]);
                int v = (ep[c][W] + d) & ((1 << epb) - 1);
                if (is_signed) v = sign_extend(static_cast<uint32_t>(v), epb);
                ep[c][e] = v;
            }
    } else if (is_signed) {
        for (int c = 0; c < 3; ++c)
            for (int e = 1; e < num_ep; ++e)
                ep[c][e] = sign_extend(static_cast<uint32_t>(ep[c][e]), epb);
    }

    // unquantize endpoints to the 17-bit interpolation space
    int unq[3][4];
    for (int c = 0; c < 3; ++c)
        for (int e = 0; e < num_ep; ++e)
            unq[c][e] = is_signed ? unquantize_s(ep[c][e], epb)
                                  : unquantize_u(ep[c][e], epb);

    // indices
    int ibits = md.two_region ? 3 : 4;
    const int* weights = md.two_region ? kWeights3 : kWeights4;
    int fixup1 = md.two_region ? kFixUp2[partition] : 0;

    for (int t = 0; t < 16; ++t) {
        int subset = md.two_region ? kPartitions2[partition][t] : 0;
        bool anchor = (t == 0) || (md.two_region && t == fixup1);
        int idx = static_cast<int>(br.read(anchor ? ibits - 1 : ibits));
        int w = weights[idx];
        int e0 = subset * 2, e1 = subset * 2 + 1;
        for (int c = 0; c < 3; ++c) {
            int a = unq[c][e0], b = unq[c][e1];
            int comp = (a * (64 - w) + b * w + 32) >> 6;
            out[t * 3 + c] = is_signed ? finish_s(comp) : finish_u(comp);
        }
    }
}

}  // namespace

extern "C" {

void bc6h_decode(const uint8_t* blocks, int64_t num_blocks, int is_signed,
                 uint16_t* out_halfs) {
    for (int64_t i = 0; i < num_blocks; ++i)
        decode_block(blocks + i * 16, is_signed != 0,
                     out_halfs + i * 16 * 3);
}

}  // extern "C"
