"""Native library tests (texture_decoder_test.cpp + meshopt_sandbox.cpp
analogues): BCn decode vs independent numpy reference, BC1 encode/decode
round-trip quality, meshlet round-trip, radix sort, GTPX container."""

import numpy as np
import pytest

from granite_tpu.native import (
    decode_blocks, encode_bc1, get_lib, gtpx_load, gtpx_save,
    meshlet_decode, meshlet_encode, radix_sort_u64,
)


def _ref_decode_bc1_block(block):
    """Independent numpy BC1 reference (spec-derived)."""
    c0 = int(block[0]) | (int(block[1]) << 8)
    c1 = int(block[2]) | (int(block[3]) << 8)
    bits = int.from_bytes(bytes(block[4:8]), "little")

    def expand(c):
        return np.array([(c >> 11 & 31) * 255 // 31,
                         (c >> 5 & 63) * 255 // 63,
                         (c & 31) * 255 // 31, 255], np.int32)
    p = [expand(c0), expand(c1)]
    if c0 > c1:
        p.append((2 * p[0] + p[1]) // 3)
        p.append((p[0] + 2 * p[1]) // 3)
        p[2][3] = p[3][3] = 255
    else:
        p.append((p[0] + p[1]) // 2)
        p.append(np.zeros(4, np.int32))
        p[2][3] = 255
    out = np.zeros((4, 4, 4), np.uint8)
    for i in range(16):
        out[i // 4, i % 4] = p[(bits >> (2 * i)) & 3]
    return out


def test_bc1_decode_matches_reference():
    rng = np.random.RandomState(0)
    blocks = rng.randint(0, 256, (6, 8), np.uint8)
    decoded = decode_blocks("bc1", blocks.ravel(), 8, 12)
    for b in range(6):
        by, bx = b // 2, b % 2
        ref = _ref_decode_bc1_block(blocks[b])
        got = decoded[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
        assert np.array_equal(got, ref), b


def test_bc1_encode_decode_roundtrip_quality():
    rng = np.random.RandomState(1)
    # Smooth gradient compresses well under BC1.
    x = np.linspace(0, 255, 16)
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., 0] = x[None, :].astype(np.uint8)
    img[..., 1] = x[:, None].astype(np.uint8)
    img[..., 2] = 128
    img[..., 3] = 255
    enc = encode_bc1(img)
    dec = decode_blocks("bc1", enc, 16, 16)
    err = np.abs(dec[..., :3].astype(int) - img[..., :3].astype(int))
    assert err.mean() < 12.0, err.mean()


def test_bc4_bc5_decode():
    # BC4 block with a0 > a1: 8-value palette interpolation.
    block = np.zeros(8, np.uint8)
    block[0] = 255
    block[1] = 0
    # indices all 0 -> every texel = a0.
    out = decode_blocks("bc4", block, 4, 4)
    assert np.all(out[..., 0] == 255)
    assert np.all(out[..., 3] == 255)
    two = np.concatenate([block, block]).astype(np.uint8)
    out5 = decode_blocks("bc5", two, 4, 4)
    assert np.all(out5[..., 0] == 255) and np.all(out5[..., 1] == 255)


def test_bc3_alpha():
    block = np.zeros(16, np.uint8)
    block[0] = 200    # alpha a0
    block[1] = 10     # alpha a1
    out = decode_blocks("bc3", block, 4, 4)
    assert np.all(out[..., 3] == 200)   # all alpha indices 0


def test_meshlet_roundtrip():
    rng = np.random.RandomState(2)
    from granite_tpu.scene.mesh_util import sphere_mesh
    m = sphere_mesh(12)
    blob, n_meshlets = meshlet_encode(m.positions, m.indices)
    assert n_meshlets >= len(m.indices) / 126
    pos, idx = meshlet_decode(blob, n_meshlets, len(m.positions) * 4,
                              len(m.indices))
    assert len(idx) == len(m.indices)
    # Triangles reference duplicated verts; compare reconstructed
    # triangle corner positions against originals.
    orig = m.positions[m.indices].reshape(-1, 3)
    got = pos[idx].reshape(-1, 3)
    extent = m.positions.max() - m.positions.min()
    assert np.abs(orig - got).max() <= extent / 65535 * 2 + 1e-6


def test_radix_sort():
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 1 << 62, 5000, np.uint64)
    order = radix_sort_u64(keys)
    s = keys[order]
    assert np.all(s[:-1] <= s[1:])
    assert sorted(order.tolist()) == list(range(5000))


def test_gtpx_container(tmp_path):
    payload = bytes(np.random.RandomState(4).randint(0, 256, 256,
                                                     np.uint8))
    p = str(tmp_path / "t.gtpx")
    gtpx_save(p, payload, "bc1", 32, 16, levels=3, flags=1)
    fmt, w, h, levels, flags, data = gtpx_load(p)
    assert (fmt, w, h, levels, flags) == ("bc1", 32, 16, 3, 1)
    assert data == payload
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.gtpx")
        open(bad, "wb").write(b"NOPE" + b"\0" * 60)
        gtpx_load(bad)


def test_decode_etc2_solid_and_modes():
    from granite_tpu.native import decode_blocks
    # Individual-mode block: 4-bit bases 0xF -> 255 (clamped after +2
    # modifier), tables 0, all indices msb=0/lsb=0.
    blk = np.array([0xFF, 0xFF, 0xFF, 0x00, 0, 0, 0, 0], np.uint8)
    out = decode_blocks("etc2", blk, 4, 4)
    assert (out[..., :3] == 255).all() and (out[..., 3] == 255).all()
    # Base 0 -> modifier +2 everywhere.
    blk0 = np.zeros(8, np.uint8)
    out0 = decode_blocks("etc2", blk0, 4, 4)
    assert (out0[..., :3] == 2).all()


def test_decode_etc2a_alpha():
    from granite_tpu.native import decode_blocks
    # Alpha block: base=128, mult=0, table=13, selectors 0 -> modifier
    # ^(msb-1): msb=0,lsb2=0 -> ~0 = -1 -> alpha = 128 - 0*mult... mult=0
    # means alpha == base for all texels.
    blk = np.zeros(16, np.uint8)
    blk[0] = 128      # alpha base
    blk[2:8] = 0      # selectors
    blk[8:11] = 0xFF  # color bases (individual mode, 255)
    out = decode_blocks("etc2a", blk, 4, 4)
    assert (out[..., 3] == 128).all()
    assert (out[..., 0] == 255).all()


def test_decode_eac_r11():
    from granite_tpu.native import decode_blocks
    blk = np.zeros(8, np.uint8)
    blk[0] = 255              # base
    blk[1] = 0x10             # mult=1, table=0
    blk[2:8] = 0xFF           # selectors: all 7 (msb=1, lsb2=3) -> +14
    out = decode_blocks("eac_r11", blk, 4, 4)
    assert (out[..., 0] == 255).all()     # clamped at 2047 >> 3
    assert (out[..., 3] == 255).all()


def _bits_to_bytes(bits):
    out = np.zeros(16, np.uint8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 1 << (i & 7)
    return out


def test_decode_bc7_mode6_solid():
    from granite_tpu.native import decode_blocks
    bits = []
    bits += [0] * 6 + [1]                 # mode 6
    val = 0x40
    for _c in range(3):                   # R0 R1 G0 G1 B0 B1 (7 bits)
        for _e in range(2):
            bits += [(val >> k) & 1 for k in range(7)]
    for _e in range(2):                   # A0 A1
        bits += [(0x7F >> k) & 1 for k in range(7)]
    bits += [1, 1]                        # p-bits
    # indices: pixel 0 has 3 bits, rest 4 bits, all zero
    bits += [0] * (3 + 15 * 4)
    blk = _bits_to_bytes(bits)
    out = decode_blocks("bc7", blk, 4, 4)
    assert (out[..., 0] == 0x81).all(), out[0, 0]
    assert (out[..., 3] == 255).all()


def test_encode_bc4_roundtrip():
    """RGTC1 encoder vs our own spec decoder (rgtc_compressor.cpp
    analogue): single channel within interpolation error."""
    from granite_tpu.native import decode_blocks, encode_bc4
    rng = np.random.RandomState(3)
    img = np.zeros((16, 16, 4), np.uint8)
    # smooth gradient + noise: exercises the 8-point ramp
    g = np.linspace(0, 255, 16)[None, :] + rng.randint(-20, 20, (16, 16))
    img[..., 0] = np.clip(g, 0, 255)
    out = decode_blocks("bc4", encode_bc4(img), 16, 16)
    err = np.abs(out[..., 0].astype(int) - img[..., 0].astype(int))
    assert err.max() <= 22 and err.mean() < 8


def test_encode_bc5_roundtrip():
    from granite_tpu.native import decode_blocks, encode_bc5
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (16, 16, 4), np.uint8)
    # smooth-ish per-block content (normal maps are low-frequency)
    img[..., 0] = np.clip(np.linspace(40, 200, 16)[None, :]
                          + rng.randint(-10, 10, (16, 16)), 0, 255)
    img[..., 1] = np.clip(np.linspace(180, 60, 16)[:, None]
                          + rng.randint(-10, 10, (16, 16)), 0, 255)
    out = decode_blocks("bc5", encode_bc5(img), 16, 16)
    for c in range(2):
        err = np.abs(out[..., c].astype(int) - img[..., c].astype(int))
        assert err.max() <= 22 and err.mean() < 8, c


def test_encode_bc3_roundtrip():
    from granite_tpu.native import decode_blocks, encode_bc3
    rng = np.random.RandomState(5)
    # structured content (real textures): gradients + mild noise
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., 0] = np.clip(xx * 14 + rng.randint(-12, 12, (16, 16)), 0, 255)
    img[..., 1] = np.clip(yy * 14 + rng.randint(-12, 12, (16, 16)), 0, 255)
    img[..., 2] = np.clip(255 - xx * 10, 0, 255)
    img[..., 3] = np.clip(xx * 8 + yy * 8, 0, 255)
    out = decode_blocks("bc3", encode_bc3(img), 16, 16)
    # alpha plane: BC4 quality; color: BC1-grade (coarser)
    aerr = np.abs(out[..., 3].astype(int) - img[..., 3].astype(int))
    assert aerr.mean() < 10
    cerr = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int))
    assert cerr.mean() < 16


def test_encode_bc7_roundtrip():
    """BC7 mode-6 encoder vs our spec decoder (the reference dispatches
    BC7 encode to an external ISPC lib, texture_compression.cpp)."""
    from granite_tpu.native import decode_blocks, encode_bc7
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 7 % 256, yy * 5 % 256, (xx + yy) * 3 % 256,
                    np.full((32, 32), 255)], -1)
    img = np.clip(img + rng.randint(-10, 10, (32, 32, 4)), 0,
                  255).astype(np.uint8)
    out = decode_blocks("bc7", encode_bc7(img), 32, 32)
    err = out.astype(np.float32) - img.astype(np.float32)
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err[..., :3] ** 2))
    assert psnr >= 30.0, psnr
    assert np.abs(err[..., 3]).max() <= 24


def test_encode_bc7_mode_bits():
    """Every emitted block must be mode 6 (low byte 0b_1000000)."""
    from granite_tpu.native import encode_bc7
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (16, 16, 4), np.uint8)
    blocks = np.asarray(encode_bc7(img)).reshape(-1, 16)
    assert (blocks[:, 0] & 0x7F == 0x40).all()


def test_encode_bc6h_roundtrip_smooth_hdr():
    """BC6H UF16 mode-3 encoder vs our decoder on env-map-like smooth
    HDR content (texture_compression.cpp BC6H row)."""
    from granite_tpu.native import decode_bc6h, encode_bc6h
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    env = np.stack([np.sin(xx / 9.0) + 1.1, np.cos(yy / 7.0) + 1.1,
                    (xx + yy) / 40.0 + 0.1], -1) * 5.0
    env = env.astype(np.float32)
    dec = decode_bc6h(encode_bc6h(env), 32, 32)
    snr = 10 * np.log10(np.mean(env ** 2) / np.mean((dec - env) ** 2))
    assert snr >= 24.0, snr


def test_encode_bc6h_bounded_and_unsigned():
    """Decoded texels stay near the block range (no half-bit
    overshoot) and negatives clamp to zero (UF16 profile)."""
    from granite_tpu.native import decode_bc6h, encode_bc6h
    rng = np.random.RandomState(9)
    hdr = (rng.rand(16, 16, 3).astype(np.float32) ** 2) * 20.0
    hdr[:4] *= 0.01
    dec = decode_bc6h(encode_bc6h(hdr), 16, 16)
    assert dec.max() <= hdr.max() * 1.1 + 1e-3
    assert dec.min() >= 0.0
    neg = np.full((4, 4, 3), -2.5, np.float32)
    dneg = decode_bc6h(encode_bc6h(neg), 4, 4)
    assert np.allclose(dneg, 0.0)


def test_image_packer_bc7_bc6h(tmp_path):
    """tools/image_packer --format bc7/bc6h produce loadable GTPX."""
    import tools.image_packer as packer
    from granite_tpu.native import decode_bc6h, decode_blocks, gtpx_load
    from granite_tpu.utils.image_io import save_png
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (8, 8, 4), np.uint8)
    src = str(tmp_path / "in.png")
    save_png(src, img)
    out7 = str(tmp_path / "out7.gtpx")
    assert packer.main([src, "--output", out7, "--format", "bc7"]) == 0
    fmt, w, h, levels, _, payload = gtpx_load(out7)
    assert (fmt, w, h, levels) == ("bc7", 8, 8, 1)
    decode_blocks("bc7", np.frombuffer(payload, np.uint8), w, h)

    hdrf = str(tmp_path / "in.npy")
    np.save(hdrf, rng.rand(8, 8, 3).astype(np.float32) * 4.0)
    out6 = str(tmp_path / "out6.gtpx")
    assert packer.main([hdrf, "--output", out6, "--format", "bc6h",
                        "--mips"]) == 0
    fmt, w, h, levels, _, payload = gtpx_load(out6)
    assert fmt == "bc6h" and levels == 4
    decode_bc6h(np.frombuffer(payload[:64], np.uint8), 8, 8)
