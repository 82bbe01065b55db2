"""ASTC LDR decoder (native/decode_astc) vs hand-packed spec blocks.

Blocks are assembled bit-by-bit in Python per the ASTC specification
(block mode layout, ISE trit/quint packing, bit-reversed weight stream),
with weights chosen constant so the expected color is exactly
lerp(ep0, ep1, w) — independent of the weight-grid infill.
"""
import numpy as np

from granite_tpu.native import decode_blocks


# --- spec trit/quint decode tables (same algorithm as the C++ side;
# used here only to INVERT the packing for test-vector assembly) -------------

def _trit_table():
    out = np.zeros(256, np.int32)
    for T in range(256):
        if ((T >> 2) & 7) == 7:
            C = (((T >> 5) & 7) << 2) | (T & 3)
            t4 = t3 = 2
        else:
            C = T & 0x1F
            if ((T >> 5) & 3) == 3:
                t4, t3 = 2, (T >> 7) & 1
            else:
                t4, t3 = (T >> 7) & 1, (T >> 5) & 3
        if (C & 3) == 3:
            t2 = 2
            t1 = (C >> 4) & 1
            c3, c2 = (C >> 3) & 1, (C >> 2) & 1
            t0 = (c3 << 1) | (c2 & ~c3 & 1)
        elif ((C >> 2) & 3) == 3:
            t2, t1, t0 = 2, 2, C & 3
        else:
            t2 = (C >> 4) & 1
            t1 = (C >> 2) & 3
            c1, c0 = (C >> 1) & 1, C & 1
            t0 = (c1 << 1) | (c0 & ~c1 & 1)
        out[T] = t0 | (t1 << 3) | (t2 << 6) | (t3 << 9) | (t4 << 12)
    return out


def _quint_table():
    out = np.zeros(128, np.int32)
    for Q in range(128):
        if ((Q >> 1) & 3) == 3 and ((Q >> 5) & 3) == 0:
            q0b, q4, q3 = Q & 1, (Q >> 4) & 1, (Q >> 3) & 1
            q2 = (q0b << 2) | (((q4 & ~q0b) & 1) << 1) | ((q3 & ~q0b) & 1)
            q1 = q0 = 4
        else:
            if ((Q >> 1) & 3) == 3:
                q2 = 4
                C = (((Q >> 3) & 3) << 3) | (((~(Q >> 5)) & 3) << 1) \
                    | (Q & 1)
            else:
                q2 = (Q >> 5) & 3
                C = Q & 0x1F
            if (C & 7) == 5:
                q1, q0 = 4, (C >> 3) & 3
            else:
                q1, q0 = (C >> 3) & 3, C & 7
        out[Q] = q0 | (q1 << 3) | (q2 << 6)
    return out


TRIT = _trit_table()
QUINT = _quint_table()


def _find_trit_code(trits):
    want = sum(t << (3 * i) for i, t in enumerate(trits))
    for T in range(256):
        if int(TRIT[T]) == want:
            return T
    raise AssertionError(trits)


def _find_quint_code(quints):
    want = sum(q << (3 * i) for i, q in enumerate(quints))
    for Q in range(128):
        if int(QUINT[Q]) == want:
            return Q
    raise AssertionError(quints)


class Bits:
    def __init__(self):
        self.b = bytearray(16)

    def set(self, pos, n, val):
        for i in range(n):
            p = pos + i
            assert 0 <= p < 128
            if (val >> i) & 1:
                self.b[p >> 3] |= 1 << (p & 7)

    def bytes(self):
        return bytes(self.b)


def pack_ise(values, bits, trits, quints):
    """Pack an ISE sequence -> (bitstring as (pos, n, val) ops, total)."""
    ops = []
    n = len(values)
    if trits:
        for blk in range((n + 4) // 5):
            vs = values[blk * 5:blk * 5 + 5] + [0] * 5
            ts = [v >> bits for v in vs[:5]]
            ms = [v & ((1 << bits) - 1) for v in vs[:5]]
            T = _find_trit_code(ts)
            sb = blk * (5 * bits + 8)
            tb = [(T >> k) & m for k, m in []]  # noqa
            ops.append((sb + bits * 1 + 0, 2, T & 3))
            ops.append((sb + bits * 2 + 2, 2, (T >> 2) & 3))
            ops.append((sb + bits * 3 + 4, 1, (T >> 4) & 1))
            ops.append((sb + bits * 4 + 5, 2, (T >> 5) & 3))
            ops.append((sb + bits * 5 + 7, 1, (T >> 7) & 1))
            for off in range(5):
                if bits:
                    m_off = off * bits + (off * 8 + 4) // 5
                    ops.append((sb + m_off, bits, ms[off]))
        total = ((n + 4) // 5) * (5 * bits + 8)
    elif quints:
        for blk in range((n + 2) // 3):
            vs = values[blk * 3:blk * 3 + 3] + [0] * 3
            qs = [v >> bits for v in vs[:3]]
            ms = [v & ((1 << bits) - 1) for v in vs[:3]]
            Q = _find_quint_code(qs)
            sb = blk * (3 * bits + 7)
            ops.append((sb + bits * 1 + 0, 3, Q & 7))
            ops.append((sb + bits * 2 + 3, 2, (Q >> 3) & 3))
            ops.append((sb + bits * 3 + 5, 2, (Q >> 5) & 3))
            for off in range(3):
                if bits:
                    m_off = off * bits + (off * 7 + 2) // 3
                    ops.append((sb + m_off, bits, ms[off]))
        total = ((n + 2) // 3) * (3 * bits + 7)
    else:
        for i, v in enumerate(values):
            ops.append((i * bits, bits, v))
        total = n * bits
    return ops, total


def write_weights(blk: Bits, ops):
    """Weights live bit-reversed from the top: stream bit i = block bit
    127-i."""
    for pos, n, val in ops:
        for i in range(n):
            if (val >> i) & 1:
                p = 127 - (pos + i)
                blk.b[p >> 3] |= 1 << (p & 7)


def unquant_weight_2bit(v):
    out = v * 0x15
    return out + 1 if out > 32 else out


def expected_ldr(e0, e1, w):
    return ((e0 * 0x101 * (64 - w) + e1 * 0x101 * w + 32) >> 6) >> 8


def _decode_one(block_bytes, bw=4, bh=4):
    data = np.frombuffer(block_bytes, np.uint8)
    return decode_blocks(f"astc_{bw}x{bh}", data, bw, bh)


def test_void_extent():
    blk = Bits()
    blk.set(0, 9, 0x1FC)
    blk.set(10, 2, 3)
    for i in range(4):
        blk.set(12 + 13 * i, 13, 0x1FFF)
    rgba16 = [0x1234, 0xABCD, 0x0000, 0xFFFF]
    for i, v in enumerate(rgba16):
        blk.set(64 + 16 * i, 16, v)
    out = _decode_one(blk.bytes())
    assert (out == np.array([0x12, 0xAB, 0x00, 0xFF], np.uint8)).all()


def _block_mode_4x4_w2():
    """Block-mode bits for a 4x4 weight grid with 2-bit weights (R=4)."""
    # lower bits[1:0] = 10 (R[2:1]=2), A(bits[6:5]) = 2 -> H=4,
    # higher bits[3:2] = 0, B(bits[8:7]) = 0 -> W=4
    return 0x2 | (0x2 << 5)


def test_single_partition_rgb_direct():
    blk = Bits()
    blk.set(0, 11, _block_mode_4x4_w2())
    blk.set(11, 2, 0)           # 1 partition
    blk.set(13, 4, 8)           # CEM 8: LDR RGB direct
    # endpoints: 6 raw 8-bit values (r0 r1 g0 g1 b0 b1), s1 >= s0
    eps = [10, 200, 30, 180, 50, 240]
    ops, _ = pack_ise(eps, 8, 0, 0)
    for pos, n, val in ops:
        blk.set(17 + pos, n, val)
    # 16 x 2-bit weights, all = 2
    wops, _ = pack_ise([2] * 16, 2, 0, 0)
    write_weights(blk, wops)
    out = _decode_one(blk.bytes())
    w = unquant_weight_2bit(2)
    want = [expected_ldr(10, 200, w), expected_ldr(30, 180, w),
            expected_ldr(50, 240, w), expected_ldr(255, 255, w)]
    assert (out == np.array(want, np.uint8)).all(), (out[0, 0], want)


def test_single_partition_rgba_base_offset_trit_endpoints():
    """CEM 13 (RGBA base+offset) with trit-encoded endpoints."""
    blk = Bits()
    blk.set(0, 11, _block_mode_4x4_w2())
    blk.set(11, 2, 0)
    blk.set(13, 4, 13)
    # 8 values at quant {6,1,0} (range 192): cost 8*6 + (8*8+4)//5 = 61
    # <= available 128-17-32 = 79 and 8-bit (64) <= 79 ... 8-bit raw fits
    # first, so use RAW 8-bit: pick offsets that stay in range.
    # v pairs (base, offset) transfer-signed; choose offset bits so the
    # decoded offsets are small positive: v1 = 4 -> after transfer:
    # v0 gains bit, ... simpler: offsets 0 -> v1 = 0.
    eps = [100, 0, 120, 0, 140, 0, 255, 0]
    ops, _ = pack_ise(eps, 8, 0, 0)
    for pos, n, val in ops:
        blk.set(17 + pos, n, val)
    wops, _ = pack_ise([1] * 16, 2, 0, 0)
    write_weights(blk, wops)
    out = _decode_one(blk.bytes())
    # bit_transfer_signed(v1=0, v0=100): b=0>>1=0 | (100&0x80)=0 -> 0;
    # a=100>>1=50 (6-bit sign-extended: 50 > 31 -> 50-64 = -14!)
    a0 = 50 - 64
    # offsets: v1 etc all zero after transfer
    e0 = np.array([a0 + 0, 60 >> 0, 0, 0])  # compute directly below
    # compute the full expectation in python:
    def bts(a, b):
        b2 = (b >> 1) | (a & 0x80)
        a2 = (a >> 1) & 0x3F
        if a2 & 0x20:
            a2 -= 0x40
        return a2, b2
    v0, v1 = bts(0, 100)[0], 0  # careful: transfer modifies (v1, v0)
    # replicate decoder exactly: bit_transfer_signed(v1, v0) with
    # v0=100 v1=0 -> in C++: (a=v1, b=v0): v0' = (v0>>1)|(v1&0x80)=50,
    # v1' = sign6((v1>>1)&0x3f) = 0
    pairs = [(100, 0), (120, 0), (140, 0), (255, 0)]
    base, off = [], []
    for b0, o in pairs:
        o2, b2 = bts(o, b0)
        base.append(b2)
        off.append(o2)
    assert sum(off[:3]) >= 0
    w = unquant_weight_2bit(1)
    want = [expected_ldr(np.clip(b, 0, 255), np.clip(b + o, 0, 255), w)
            for b, o in zip(base, off)]
    assert (out == np.array(want, np.uint8)).all(), (out[0, 0], want)


def test_two_partitions_shared_cem_quint_endpoints():
    """2 partitions, single shared CEM 8, quint-encoded endpoints.

    Endpoints identical across partitions, so the expected color is
    uniform regardless of the partition pattern."""
    blk = Bits()
    blk.set(0, 11, _block_mode_4x4_w2())
    blk.set(11, 2, 1)           # 2 partitions
    blk.set(13, 10, 0x155)      # seed
    blk.set(23, 6, 8 << 2)      # single-CEM marker (low 2 bits 0), CEM 8
    # 12 endpoint values; available = 128-29-32 = 67 ->
    # first fitting quant: {3,0,1} cost 12*3 + ceil(7*12/3) = 36+28 = 64
    # quint range = 40: value = (q << 3) | m
    def qv(q, m):
        return (q << 3) | m
    one = [qv(0, 1), qv(4, 7), qv(1, 2), qv(3, 0), qv(2, 5), qv(4, 0)]
    eps = one + one            # both partitions identical
    ops, total = pack_ise(eps, 3, 0, 1)
    assert total >= 64
    for pos, n, val in ops:
        blk.set(29 + pos, n, val)
    wops, _ = pack_ise([3] * 16, 2, 0, 0)
    write_weights(blk, wops)
    out = _decode_one(blk.bytes())

    # unquant {3,0,1}: A/B/C from the quint table path
    def unq_ep(v):
        b = (v >> 1) & 1
        c = (v >> 2) & 1
        A = (v & 1) * 0x1FF
        D = v >> 3
        C = 26
        B = b * 0x82 + c * 0x105
        unq = (D * C + B) ^ A
        return (A & 0x80) | (unq >> 2)
    vals = [unq_ep(v) for v in one]
    s0 = vals[0] + vals[2] + vals[4]
    s1 = vals[1] + vals[3] + vals[5]
    w = unquant_weight_2bit(3)
    if s1 >= s0:
        e0 = [vals[0], vals[2], vals[4], 255]
        e1 = [vals[1], vals[3], vals[5], 255]
    else:
        e0 = [(vals[1] + vals[5]) >> 1, (vals[3] + vals[5]) >> 1,
              vals[5], 255]
        e1 = [(vals[0] + vals[4]) >> 1, (vals[2] + vals[4]) >> 1,
              vals[4], 255]
    want = [expected_ldr(a, b2, w) for a, b2 in zip(e0, e1)]
    assert (out == np.array(want, np.uint8)).all(), (out[0, 0], want)


def test_hdr_block_is_error_color():
    blk = Bits()
    blk.set(0, 11, _block_mode_4x4_w2())
    blk.set(11, 2, 0)
    blk.set(13, 4, 2)           # CEM 2: HDR luma -> LDR error
    ops, _ = pack_ise([0, 0], 8, 0, 0)
    for pos, n, val in ops:
        blk.set(17 + pos, n, val)
    wops, _ = pack_ise([0] * 16, 2, 0, 0)
    write_weights(blk, wops)
    out = _decode_one(blk.bytes())
    assert (out == np.array([255, 0, 255, 255], np.uint8)).all()


def test_nonsquare_footprint_8x6():
    """8x6 blocks with a 4x3 weight grid, constant weights."""
    blk = Bits()
    # lower bits[1:0]=10 (R[2:1]=2 -> R=4, 2-bit), higher=0:
    # W = B+4 = 4 (bits[8:7]=0), H = A+2 = 3 (bits[6:5]=1)
    blk.set(0, 11, 0x2 | (0x1 << 5))
    blk.set(11, 2, 0)
    blk.set(13, 4, 8)
    eps = [0, 255, 0, 255, 0, 255]
    ops, _ = pack_ise(eps, 8, 0, 0)
    for pos, n, val in ops:
        blk.set(17 + pos, n, val)
    wops, _ = pack_ise([3] * 12, 2, 0, 0)   # 12 weights, all = 3
    write_weights(blk, wops)
    out = _decode_one(blk.bytes(), 8, 6)
    w = unquant_weight_2bit(3)
    v = expected_ldr(0, 255, w)
    want = np.array([v, v, v, expected_ldr(255, 255, w)], np.uint8)
    assert out.shape == (6, 8, 4)
    assert (out == want).all()


def test_two_partitions_pattern_differs():
    """Different endpoints per partition: the output must contain both
    colors and every pixel must be one of the two."""
    blk = Bits()
    blk.set(0, 11, _block_mode_4x4_w2())
    blk.set(11, 2, 1)
    blk.set(13, 10, 0x3D)       # arbitrary seed
    blk.set(23, 6, 0 << 2)      # shared CEM 0 (luma direct)
    # pairs/partition = 1 -> 4 values; available = 67 -> 8-bit raw fits
    eps = [10, 10, 240, 240]    # p0 luma 10, p1 luma 240 (flat)
    ops, _ = pack_ise(eps, 8, 0, 0)
    for pos, n, val in ops:
        blk.set(29 + pos, n, val)
    wops, _ = pack_ise([0] * 16, 2, 0, 0)
    write_weights(blk, wops)
    out = _decode_one(blk.bytes())
    lum = out[..., 0]
    assert set(np.unique(lum)) <= {10, 240}
    assert len(np.unique(lum)) == 2     # seed 0x3D splits the block
