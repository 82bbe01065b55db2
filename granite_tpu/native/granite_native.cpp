// granite_native — host-side data-plane library.
//
// The reference implements these in C++ inside the engine:
//   * GPU-format texture transcode (vulkan/texture/texture_decoder.cpp
//     decodes BC/ETC2/ASTC blocks when hardware lacks the format; here the
//     TPU always lacks them, so decode runs on host at asset load),
//   * the MemoryMappedTexture (GTX) container (vulkan/texture/
//     memory_mapped_texture.cpp),
//   * meshlet encode/decode (vulkan/mesh/meshlet.cpp +
//     scene-export/meshlet_export.cpp),
//   * 64-bit radix sort for draw lists (util/radix_sorter.hpp).
//
// This is a fresh implementation against the public format specs (BCn per
// the Khronos Data Format spec), not a port of the reference's code.
// Exposed as extern "C" for ctypes.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// BCn block decompression (Khronos Data Format / S3TC spec).
// ---------------------------------------------------------------------------

static inline void decode_bc1_colors(uint16_t c0, uint16_t c1,
                                     uint8_t pal[4][4], bool allow_alpha) {
    auto expand = [](uint16_t c, uint8_t *rgb) {
        rgb[0] = (uint8_t)(((c >> 11) & 31) * 255 / 31);
        rgb[1] = (uint8_t)(((c >> 5) & 63) * 255 / 63);
        rgb[2] = (uint8_t)((c & 31) * 255 / 31);
    };
    expand(c0, pal[0]);
    expand(c1, pal[1]);
    pal[0][3] = pal[1][3] = 255;
    if (c0 > c1 || !allow_alpha) {
        for (int i = 0; i < 3; i++) {
            pal[2][i] = (uint8_t)((2 * pal[0][i] + pal[1][i]) / 3);
            pal[3][i] = (uint8_t)((pal[0][i] + 2 * pal[1][i]) / 3);
        }
        pal[2][3] = pal[3][3] = 255;
    } else {
        for (int i = 0; i < 3; i++) {
            pal[2][i] = (uint8_t)((pal[0][i] + pal[1][i]) / 2);
            pal[3][i] = 0;
        }
        pal[2][3] = 255;
        pal[3][3] = 0;
    }
}

// BC1: 8 bytes/block -> 4x4 RGBA8.
void decode_bc1(const uint8_t *src, uint8_t *dst, int width, int height) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; by++)
        for (int bx = 0; bx < bw; bx++) {
            const uint8_t *b = src + (by * bw + bx) * 8;
            uint16_t c0 = (uint16_t)(b[0] | (b[1] << 8));
            uint16_t c1 = (uint16_t)(b[2] | (b[3] << 8));
            uint32_t bits;
            memcpy(&bits, b + 4, 4);
            uint8_t pal[4][4];
            decode_bc1_colors(c0, c1, pal, true);
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    int px = bx * 4 + x, py = by * 4 + y;
                    if (px >= width || py >= height) continue;
                    int idx = (bits >> (2 * (y * 4 + x))) & 3;
                    memcpy(dst + (py * width + px) * 4, pal[idx], 4);
                }
        }
}

// BC4 single-channel helper: 8 bytes -> 16 values.
static void decode_bc4_block(const uint8_t *b, uint8_t out[16]) {
    int a0 = b[0], a1 = b[1];
    uint64_t bits = 0;
    for (int i = 0; i < 6; i++)
        bits |= (uint64_t)b[2 + i] << (8 * i);
    int pal[8];
    pal[0] = a0;
    pal[1] = a1;
    if (a0 > a1)
        for (int i = 1; i < 7; i++) pal[1 + i] = ((7 - i) * a0 + i * a1) / 7;
    else {
        for (int i = 1; i < 5; i++) pal[1 + i] = ((5 - i) * a0 + i * a1) / 5;
        pal[6] = 0;
        pal[7] = 255;
    }
    for (int i = 0; i < 16; i++)
        out[i] = (uint8_t)pal[(bits >> (3 * i)) & 7];
}

// BC3: 16 bytes/block (BC4 alpha + BC1 color).
void decode_bc3(const uint8_t *src, uint8_t *dst, int width, int height) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; by++)
        for (int bx = 0; bx < bw; bx++) {
            const uint8_t *b = src + (by * bw + bx) * 16;
            uint8_t alpha[16];
            decode_bc4_block(b, alpha);
            uint16_t c0 = (uint16_t)(b[8] | (b[9] << 8));
            uint16_t c1 = (uint16_t)(b[10] | (b[11] << 8));
            uint32_t bits;
            memcpy(&bits, b + 12, 4);
            uint8_t pal[4][4];
            decode_bc1_colors(c0, c1, pal, false);
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    int px = bx * 4 + x, py = by * 4 + y;
                    if (px >= width || py >= height) continue;
                    int idx = (bits >> (2 * (y * 4 + x))) & 3;
                    uint8_t *d = dst + (py * width + px) * 4;
                    memcpy(d, pal[idx], 3);
                    d[3] = alpha[y * 4 + x];
                }
        }
}

// BC4 (R) / BC5 (RG), expanded to RGBA8.
void decode_bc4(const uint8_t *src, uint8_t *dst, int width, int height) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; by++)
        for (int bx = 0; bx < bw; bx++) {
            uint8_t r[16];
            decode_bc4_block(src + (by * bw + bx) * 8, r);
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    int px = bx * 4 + x, py = by * 4 + y;
                    if (px >= width || py >= height) continue;
                    uint8_t *d = dst + (py * width + px) * 4;
                    d[0] = r[y * 4 + x];
                    d[1] = d[2] = 0;
                    d[3] = 255;
                }
        }
}

void decode_bc5(const uint8_t *src, uint8_t *dst, int width, int height) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; by++)
        for (int bx = 0; bx < bw; bx++) {
            uint8_t r[16], g[16];
            const uint8_t *b = src + (by * bw + bx) * 16;
            decode_bc4_block(b, r);
            decode_bc4_block(b + 8, g);
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    int px = bx * 4 + x, py = by * 4 + y;
                    if (px >= width || py >= height) continue;
                    uint8_t *d = dst + (py * width + px) * 4;
                    d[0] = r[y * 4 + x];
                    d[1] = g[y * 4 + x];
                    d[2] = 0;
                    d[3] = 255;
                }
        }
}

// ---------------------------------------------------------------------------
// BC1 encoder (min/max bounding-box fit) — the repacker's compressor
// (scene-export/texture_compression.cpp analogue, simplified fit).
// ---------------------------------------------------------------------------

static uint16_t pack565(const uint8_t *rgb) {
    return (uint16_t)(((rgb[0] * 31 / 255) << 11) |
                      ((rgb[1] * 63 / 255) << 5) |
                      (rgb[2] * 31 / 255));
}

void encode_bc1(const uint8_t *src, uint8_t *dst, int width, int height) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; by++)
        for (int bx = 0; bx < bw; bx++) {
            uint8_t mn[3] = {255, 255, 255}, mx[3] = {0, 0, 0};
            uint8_t texels[16][4];
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    int px = std::min(bx * 4 + x, width - 1);
                    int py = std::min(by * 4 + y, height - 1);
                    const uint8_t *s = src + (py * width + px) * 4;
                    memcpy(texels[y * 4 + x], s, 4);
                    for (int c = 0; c < 3; c++) {
                        mn[c] = std::min(mn[c], s[c]);
                        mx[c] = std::max(mx[c], s[c]);
                    }
                }
            uint16_t c0 = pack565(mx), c1 = pack565(mn);
            if (c0 < c1) std::swap(c0, c1);
            uint8_t pal[4][4];
            decode_bc1_colors(c0, c1, pal, false);
            uint32_t bits = 0;
            for (int i = 0; i < 16; i++) {
                int best = 0;
                long bestd = 1L << 60;
                for (int p = 0; p < 4; p++) {
                    long d = 0;
                    for (int c = 0; c < 3; c++) {
                        long diff = (long)texels[i][c] - pal[p][c];
                        d += diff * diff;
                    }
                    if (d < bestd) { bestd = d; best = p; }
                }
                bits |= (uint32_t)best << (2 * i);
            }
            uint8_t *out = dst + (by * bw + bx) * 8;
            out[0] = (uint8_t)c0; out[1] = (uint8_t)(c0 >> 8);
            out[2] = (uint8_t)c1; out[3] = (uint8_t)(c1 >> 8);
            memcpy(out + 4, &bits, 4);
        }
}

// ---------------------------------------------------------------------------
// Meshlet codec (vulkan/mesh/meshlet.{hpp,cpp} redesign).
//
// Layout "MLT1": meshlets of <=64 vertices / <=126 triangles; positions
// quantized to 16-bit unorm within the meshlet AABB; indices as 8-bit
// local ids.  Decode reproduces float positions within quantization step.
// ---------------------------------------------------------------------------

struct MeshletHeader {
    uint32_t vertex_count;
    uint32_t triangle_count;
    float aabb_min[3];
    float aabb_max[3];
};

int meshlet_encode(const float *positions, int num_vertices,
                   const int32_t *indices, int num_triangles,
                   uint8_t *out, int out_capacity, int *out_size,
                   int *out_meshlets) {
    std::vector<uint8_t> buf;
    int t = 0, meshlets = 0;
    while (t < num_triangles) {
        // Greedy fill: accumulate triangles until 64 verts or 126 tris.
        std::vector<int32_t> local;        // global vertex ids
        std::vector<uint8_t> ltris;
        auto local_id = [&](int32_t g) -> int {
            for (size_t i = 0; i < local.size(); i++)
                if (local[i] == g) return (int)i;
            local.push_back(g);
            return (int)local.size() - 1;
        };
        int start = t;
        while (t < num_triangles && ltris.size() / 3 < 126) {
            int32_t a = indices[t * 3], b = indices[t * 3 + 1],
                    c = indices[t * 3 + 2];
            size_t before = local.size();
            int la = local_id(a), lb = local_id(b), lc = local_id(c);
            if (local.size() > 64) {
                local.resize(before);  // revert; meshlet full
                break;
            }
            ltris.push_back((uint8_t)la);
            ltris.push_back((uint8_t)lb);
            ltris.push_back((uint8_t)lc);
            t++;
        }
        if (t == start) return -2;         // triangle didn't fit (degenerate)

        MeshletHeader h;
        h.vertex_count = (uint32_t)local.size();
        h.triangle_count = (uint32_t)(ltris.size() / 3);
        for (int c = 0; c < 3; c++) {
            h.aabb_min[c] = 1e30f;
            h.aabb_max[c] = -1e30f;
        }
        for (int32_t g : local)
            for (int c = 0; c < 3; c++) {
                float v = positions[g * 3 + c];
                h.aabb_min[c] = std::min(h.aabb_min[c], v);
                h.aabb_max[c] = std::max(h.aabb_max[c], v);
            }
        size_t off = buf.size();
        buf.resize(off + sizeof(h));
        memcpy(buf.data() + off, &h, sizeof(h));
        for (int32_t g : local)
            for (int c = 0; c < 3; c++) {
                float ext = h.aabb_max[c] - h.aabb_min[c];
                float n = ext > 0 ?
                    (positions[g * 3 + c] - h.aabb_min[c]) / ext : 0.f;
                uint16_t q = (uint16_t)(n * 65535.f + 0.5f);
                buf.push_back((uint8_t)q);
                buf.push_back((uint8_t)(q >> 8));
            }
        buf.insert(buf.end(), ltris.begin(), ltris.end());
        if (buf.size() % 4) buf.resize((buf.size() + 3) & ~3u);
        meshlets++;
    }
    *out_size = (int)buf.size();
    *out_meshlets = meshlets;
    if ((int)buf.size() > out_capacity) return -1;
    memcpy(out, buf.data(), buf.size());
    return 0;
}

int meshlet_decode(const uint8_t *data, int size, int num_meshlets,
                   float *out_positions, int32_t *out_indices,
                   int *out_vertices, int *out_triangles) {
    size_t off = 0;
    int vtotal = 0, ttotal = 0;
    for (int m = 0; m < num_meshlets; m++) {
        if (off + sizeof(MeshletHeader) > (size_t)size) return -1;
        MeshletHeader h;
        memcpy(&h, data + off, sizeof(h));
        off += sizeof(h);
        int base = vtotal;
        for (uint32_t v = 0; v < h.vertex_count; v++) {
            for (int c = 0; c < 3; c++) {
                uint16_t q = (uint16_t)(data[off] | (data[off + 1] << 8));
                off += 2;
                float ext = h.aabb_max[c] - h.aabb_min[c];
                out_positions[(base + v) * 3 + c] =
                    h.aabb_min[c] + ext * (q / 65535.f);
            }
        }
        for (uint32_t tt = 0; tt < h.triangle_count * 3; tt++)
            out_indices[ttotal * 3 + tt] = base + data[off + tt];
        off += h.triangle_count * 3;
        off = (off + 3) & ~3u;
        vtotal += h.vertex_count;
        ttotal += h.triangle_count;
    }
    *out_vertices = vtotal;
    *out_triangles = ttotal;
    return 0;
}

// ---------------------------------------------------------------------------
// 64-bit radix sort (util/radix_sorter.hpp analogue) — returns the
// permutation ordering keys ascending; used for draw-list sorting.
// ---------------------------------------------------------------------------

void radix_sort_u64(const uint64_t *keys, uint32_t *order, int n) {
    std::vector<uint32_t> tmp(n), cur(n);
    std::vector<uint64_t> kb(n), ka(keys, keys + n);
    for (int i = 0; i < n; i++) cur[i] = (uint32_t)i;
    for (int shift = 0; shift < 64; shift += 8) {
        uint32_t count[257] = {0};
        for (int i = 0; i < n; i++)
            count[((ka[i] >> shift) & 255) + 1]++;
        for (int i = 0; i < 256; i++) count[i + 1] += count[i];
        for (int i = 0; i < n; i++) {
            uint32_t d = (uint32_t)((ka[i] >> shift) & 255);
            uint32_t pos = count[d]++;
            tmp[pos] = cur[i];
            kb[pos] = ka[i];
        }
        std::swap(cur, tmp);
        std::swap(ka, kb);
    }
    memcpy(order, cur.data(), n * sizeof(uint32_t));
}

// ---------------------------------------------------------------------------
// GTX-style container ("GTPX") — mmap-friendly texture file
// (vulkan/texture/memory_mapped_texture.cpp analogue; fresh layout).
// Header: magic 'GTPX', version, format, width, height, levels, flags,
// then per-level {offset, size} table, then payload.
// ---------------------------------------------------------------------------

struct GtpxHeader {
    char magic[4];       // "GTPX"
    uint32_t version;    // 1
    uint32_t format;     // 0=RGBA8, 1=BC1, 3=BC3, 4=BC4, 5=BC5
    uint32_t width, height, levels, flags;
};

int gtpx_write_header(uint8_t *out, uint32_t format, uint32_t width,
                      uint32_t height, uint32_t levels, uint32_t flags) {
    GtpxHeader h;
    memcpy(h.magic, "GTPX", 4);
    h.version = 1;
    h.format = format;
    h.width = width;
    h.height = height;
    h.levels = levels;
    h.flags = flags;
    memcpy(out, &h, sizeof(h));
    return (int)sizeof(h);
}

int gtpx_read_header(const uint8_t *data, int size, uint32_t *format,
                     uint32_t *width, uint32_t *height, uint32_t *levels,
                     uint32_t *flags) {
    if (size < (int)sizeof(GtpxHeader)) return -1;
    GtpxHeader h;
    memcpy(&h, data, sizeof(h));
    if (memcmp(h.magic, "GTPX", 4) != 0 || h.version != 1) return -2;
    *format = h.format;
    *width = h.width;
    *height = h.height;
    *levels = h.levels;
    *flags = h.flags;
    return (int)sizeof(GtpxHeader);
}

}  // extern "C"
