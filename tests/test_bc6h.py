"""BC6H decoder tests (texture_decoder.cpp BC6H parity; D3D11.3 19.5).

Blocks are hand-assembled with a Python bit-writer following the spec
layout and checked against an independent numpy model of unquantize /
interpolate / half-float finish.
"""

import numpy as np

from granite_tpu.native import decode_bc6h

W3 = np.array([0, 9, 18, 27, 37, 46, 55, 64])
W4 = np.array([0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60,
               64])


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v: int, n: int):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def block(self) -> np.ndarray:
        assert len(self.bits) <= 128
        self.bits += [0] * (128 - len(self.bits))
        out = np.zeros(16, np.uint8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return out


def unq_unsigned(v, bits):
    if bits >= 15:
        return v
    if v == 0:
        return 0
    if v == (1 << bits) - 1:
        return 0xFFFF
    return ((v << 15) + 0x4000) >> (bits - 1)


def unq_signed(v, bits):
    s = v < 0
    v = abs(v)
    if v == 0:
        out = 0
    elif v >= (1 << (bits - 1)) - 1:
        out = 0x7FFF
    else:
        out = ((v << 15) + 0x4000) >> (bits - 1)
    return -out if s else out


def finish_unsigned(interp):
    return np.uint16((interp * 31) >> 6).view(np.float16)


def finish_signed(interp):
    s = interp < 0
    v = (abs(interp) * 31) >> 5
    return np.uint16((0x8000 if s else 0) | v).view(np.float16)


def test_mode3_10_10_unsigned():
    """One-subset untransformed 10.10 (mode bits 00011)."""
    rng = np.random.RandomState(5)
    e0 = rng.randint(0, 1024, 3)
    e1 = rng.randint(0, 1024, 3)
    idx = rng.randint(0, 16, 16)
    idx[0] &= 7                             # anchor: 3 bits
    w = BitWriter()
    w.put(0b00011 & 3, 2)
    w.put(0b00011 >> 2, 3)
    for c in range(3):
        w.put(int(e0[c]), 10)
    for c in range(3):
        w.put(int(e1[c]), 10)
    w.put(int(idx[0]), 3)
    for i in range(1, 16):
        w.put(int(idx[i]), 4)
    out = decode_bc6h(w.block(), 4, 4)
    for px in range(16):
        wt = W4[idx[px]]
        for c in range(3):
            interp = (unq_unsigned(int(e0[c]), 10) * (64 - wt)
                      + unq_unsigned(int(e1[c]), 10) * wt + 32) >> 6
            exp = float(finish_unsigned(interp))
            assert abs(out[px // 4, px % 4, c] - exp) <= 1e-6, \
                (px, c, out[px // 4, px % 4, c], exp)


def test_mode7_11_9_delta():
    """One-subset transformed 11.9 (mode bits 00111)."""
    base = [900, 512, 100]
    delta = [5, -9, 255]                    # 9-bit two's complement
    idx = [3] * 16
    w = BitWriter()
    w.put(0b00111 & 3, 2)
    w.put(0b00111 >> 2, 3)
    for c in range(3):
        w.put(base[c] & 1023, 10)
    for c in range(3):
        w.put(delta[c] & 511, 9)
        w.put((base[c] >> 10) & 1, 1)
    w.put(idx[0], 3)
    for i in range(1, 16):
        w.put(idx[i], 4)
    out = decode_bc6h(w.block(), 4, 4)
    for c in range(3):
        e1 = (base[c] + delta[c]) & 2047
        interp = (unq_unsigned(base[c], 11) * (64 - W4[3])
                  + unq_unsigned(e1, 11) * W4[3] + 32) >> 6
        exp = float(finish_unsigned(interp))
        assert abs(out[0, 0, c] - exp) <= 1e-6


def test_mode3_signed_negative():
    e0 = [-200 & 1023, 300, 0]              # r negative (10-bit 2c)
    e1 = [100, -1 & 1023, 511]
    w = BitWriter()
    w.put(3, 2)
    w.put(0, 3)
    for c in range(3):
        w.put(e0[c], 10)
    for c in range(3):
        w.put(e1[c], 10)
    w.put(0, 3)                             # anchor idx 0 -> pure e0
    w.put(15, 4)                            # px1 idx 15 -> pure e1
    for i in range(2, 16):
        w.put(0, 4)
    out = decode_bc6h(w.block(), 4, 4, signed=True)

    def sext(v):
        return v - 1024 if v & 512 else v
    for c in range(3):
        interp0 = unq_signed(sext(e0[c]), 10)
        exp0 = float(finish_signed(interp0))
        assert abs(out[0, 0, c] - exp0) <= 1e-6
        interp1 = unq_signed(sext(e1[c]), 10)
        exp1 = float(finish_signed(interp1))
        assert abs(out[0, 1, c] - exp1) <= 1e-6
    assert out[0, 0, 0] < 0.0               # negative red survived


def test_two_subset_mode0():
    """10.555 two-subset (mode bits 00): flat endpoints per subset, zero
    deltas -> each pixel shows its subset's base color."""
    base0 = [512, 256, 128]                 # subset 0 e0
    partition = 0                           # left/right split pattern
    w = BitWriter()
    w.put(0, 2)
    # gy[4], by[4], bz[4]
    w.put(0, 1), w.put(0, 1), w.put(0, 1)
    for c in range(3):
        w.put(base0[c], 10)
    # rx[4:0], gz[4], gy[3:0]
    w.put(0, 5), w.put(0, 1), w.put(0, 4)
    # gx[4:0], bz[0], gz[3:0]
    w.put(0, 5), w.put(0, 1), w.put(0, 4)
    # bx[4:0], bz[1], by[3:0]
    w.put(0, 5), w.put(0, 1), w.put(0, 4)
    # ry[4:0], bz[2]  -- subset1 e0 delta = +8 red
    w.put(8, 5), w.put(0, 1)
    # rz[4:0], bz[3]
    w.put(8, 5), w.put(0, 1)
    w.put(partition, 5)
    # indices: all 0 (anchors px0 and anchor2[0]=15 use 2 bits)
    from granite_tpu.native import get_lib  # noqa: F401 (build first)
    w.put(0, 2)
    for i in range(1, 16):
        w.put(0, 2 if i == 15 else 3)
    out = decode_bc6h(w.block(), 4, 4)
    # partition 0 of the BC7/BC6 table: left half subset0, right subset1
    interp_s0 = unq_unsigned(base0[0], 10)
    interp_s1 = unq_unsigned((base0[0] + 8) & 1023, 10)
    exp0 = float(finish_unsigned(interp_s0))
    exp1 = float(finish_unsigned(interp_s1))
    assert abs(out[0, 0, 0] - exp0) <= 1e-6
    assert abs(out[0, 3, 0] - exp1) <= 1e-6
    assert out[0, 3, 0] != out[0, 0, 0]


def test_reserved_mode_zero_block():
    blk = np.zeros(16, np.uint8)
    blk[0] = 0b10011 & 0xFF                 # reserved 5-bit mode 10011
    out = decode_bc6h(blk, 4, 4)
    assert (out == 0).all()


def test_bc6h_gtpx_roundtrip(tmp_path):
    from granite_tpu.native import gtpx_load, gtpx_save
    payload = bytes(np.zeros(16, np.uint8))
    p = str(tmp_path / "t.gtpx")
    gtpx_save(p, payload, "bc6h", 4, 4)
    fmt, w, h, l, fl, data = gtpx_load(p)
    assert fmt == "bc6h" and (w, h) == (4, 4)
