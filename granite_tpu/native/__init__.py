"""ctypes bindings for the native host library (granite_native.cpp).

Built from source on first use with g++ -O2 -shared; the .so is cached
next to the source keyed by a source CONTENT HASH embedded in the file
name (mtime is unreliable after a fresh checkout, where source and a
stale binary share the checkout time).  The binary is never committed.
All entry points have pure-Python behavioral twins in tests (decode
correctness is validated against straightforward numpy reference
decoders).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "granite_native.cpp")

_lib = None


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libgranite_native-{digest}.so")


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    so = _so_path()
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp], check=True)
        os.replace(tmp, so)   # atomic vs concurrent builders
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    for name in ("decode_bc1", "decode_bc3", "decode_bc4", "decode_bc5",
                 "decode_bc7", "encode_bc1", "encode_bc3", "encode_bc4",
                 "encode_bc5", "encode_bc7"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int]
        fn.restype = None
    for name in ("decode_etc2", "decode_eac"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        fn.restype = None
    lib.meshlet_encode.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                                   u8p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.meshlet_encode.restype = ctypes.c_int
    lib.meshlet_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p,
                                   i32p, ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.meshlet_decode.restype = ctypes.c_int
    lib.meshlet2_encode.argtypes = [f32p, f32p, f32p, ctypes.c_int, i32p,
                                    ctypes.c_int, u8p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
    lib.meshlet2_encode.restype = ctypes.c_int
    lib.meshlet2_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p,
                                    f32p, f32p, i32p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
    lib.meshlet2_decode.restype = ctypes.c_int
    lib.decode_bc6h.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int]
    lib.decode_bc6h.restype = None
    lib.encode_bc6h.argtypes = [f32p, u8p, ctypes.c_int, ctypes.c_int]
    lib.encode_bc6h.restype = None
    lib.decode_astc.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
    lib.decode_astc.restype = None
    lib.radix_sort_u64.argtypes = [u64p, u32p, ctypes.c_int]
    lib.radix_sort_u64.restype = None
    lib.gtpx_write_header.argtypes = [u8p] + [ctypes.c_uint32] * 5
    lib.gtpx_write_header.restype = ctypes.c_int
    lib.gtpx_read_header.argtypes = [u8p, ctypes.c_int] + [u32p] * 5
    lib.gtpx_read_header.restype = ctypes.c_int
    _lib = lib
    return lib


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_blocks(fmt: str, data: np.ndarray, width: int,
                  height: int) -> np.ndarray:
    """Decode a block-compressed level to (H, W, 4) uint8.

    Formats: bc1/bc3/bc4/bc5/bc7, etc2 (RGB8), etc2a (RGB8A8),
    etc2p (punchthrough RGB8A1), eac_r11, eac_rg11, and
    astc_WxH for any legal 2D footprint (e.g. "astc_4x4", "astc_8x6";
    LDR profile — HDR blocks decode to the spec error color)
    (texture_decoder.cpp:30-120 format coverage)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty((height, width, 4), np.uint8)
    if fmt in ("etc2", "etc2a", "etc2p"):
        alpha_bits = {"etc2": 0, "etc2a": 8, "etc2p": 1}[fmt]
        lib.decode_etc2(_u8(data), _u8(out), width, height, alpha_bits)
    elif fmt in ("eac_r11", "eac_rg11"):
        lib.decode_eac(_u8(data), _u8(out), width, height,
                       1 if fmt == "eac_r11" else 2)
    elif fmt.startswith("astc_"):
        bw, bh = (int(t) for t in fmt[5:].split("x"))
        lib.decode_astc(_u8(data), _u8(out), width, height, bw, bh)
    else:
        getattr(lib, f"decode_{fmt}")(_u8(data), _u8(out), width, height)
    return out


def decode_bc6h(data: np.ndarray, width: int, height: int,
                signed: bool = False) -> np.ndarray:
    """Decode BC6H (UF16/SF16) to (H, W, 3) float32 linear HDR
    (texture_decoder.cpp BC6H rows)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty((height, width, 3), np.float32)
    lib.decode_bc6h(_u8(data),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    width, height, 1 if signed else 0)
    return out


def encode_bc1(rgba: np.ndarray) -> np.ndarray:
    lib = get_lib()
    h, w = rgba.shape[:2]
    rgba = np.ascontiguousarray(rgba, np.uint8)
    out = np.empty(((h + 3) // 4) * ((w + 3) // 4) * 8, np.uint8)
    lib.encode_bc1(_u8(rgba), _u8(out), w, h)
    return out


def _encode_bcn(rgba: np.ndarray, fn_name: str, block: int) -> np.ndarray:
    lib = get_lib()
    h, w = rgba.shape[:2]
    rgba = np.ascontiguousarray(rgba, np.uint8)
    out = np.empty(((h + 3) // 4) * ((w + 3) // 4) * block, np.uint8)
    getattr(lib, fn_name)(_u8(rgba), _u8(out), w, h)
    return out


def encode_bc3(rgba: np.ndarray) -> np.ndarray:
    """RGBA -> BC3 (BC1 color + BC4 alpha; texture_compression.cpp)."""
    return _encode_bcn(rgba, "encode_bc3", 16)


def encode_bc4(rgba: np.ndarray) -> np.ndarray:
    """R channel -> BC4/RGTC1 (rgtc_compressor.cpp)."""
    return _encode_bcn(rgba, "encode_bc4", 8)


def encode_bc5(rgba: np.ndarray) -> np.ndarray:
    """RG channels -> BC5/RGTC2 (normal-map XY)."""
    return _encode_bcn(rgba, "encode_bc5", 16)


def encode_bc7(rgba: np.ndarray) -> np.ndarray:
    """RGBA -> BC7 (mode-6 single-subset encoder; the reference
    dispatches BC7 to an external ISPC encoder in
    scene-export/texture_compression.cpp — this is a fresh spec
    implementation, decodable by decode_blocks('bc7', ...))."""
    return _encode_bcn(rgba, "encode_bc7", 16)


def encode_bc6h(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) float32 linear HDR -> BC6H UF16 (mode-3 10.10
    encoder; negatives clamp to 0 per the unsigned profile)."""
    lib = get_lib()
    h, w = rgb.shape[:2]
    rgb = np.ascontiguousarray(rgb[..., :3], np.float32)
    out = np.empty(((h + 3) // 4) * ((w + 3) // 4) * 16, np.uint8)
    lib.encode_bc6h(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _u8(out), w, h)
    return out


def meshlet_encode(positions: np.ndarray, indices: np.ndarray):
    """Returns (blob bytes, num_meshlets)."""
    lib = get_lib()
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    nv = len(positions)
    nt = len(indices)
    cap = 64 + nv * 8 + nt * 16
    out = np.empty(cap, np.uint8)
    size = ctypes.c_int()
    meshlets = ctypes.c_int()
    rc = lib.meshlet_encode(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt,
        _u8(out), cap, ctypes.byref(size), ctypes.byref(meshlets))
    if rc != 0:
        raise RuntimeError(f"meshlet_encode failed rc={rc}")
    return bytes(out[:size.value]), meshlets.value


def meshlet_decode(blob: bytes, num_meshlets: int, max_vertices: int,
                   max_triangles: int):
    """Returns (positions (V,3) f32, indices (T,3) i32)."""
    lib = get_lib()
    data = np.frombuffer(blob, np.uint8)
    pos = np.empty((max_vertices, 3), np.float32)
    idx = np.empty((max_triangles, 3), np.int32)
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.meshlet_decode(
        _u8(data), len(data), num_meshlets,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError(f"meshlet_decode failed rc={rc}")
    return pos[:nv.value].copy(), idx[:nt.value].copy()


def meshlet2_encode(positions: np.ndarray, normals, uvs,
                    indices: np.ndarray):
    """Full-attribute meshlet streams (MLT2: pos 16-bit unorm in AABB,
    oct-16 normals, UV 16-bit unorm in UV AABB).  Returns (blob,
    num_meshlets).  Reference stream set: vulkan/mesh/meshlet.hpp:85-93."""
    lib = get_lib()
    f32p = ctypes.POINTER(ctypes.c_float)
    positions = np.ascontiguousarray(positions, np.float32)
    nv = len(positions)
    if normals is None:
        normals = np.zeros((nv, 3), np.float32)
    if uvs is None:
        uvs = np.zeros((nv, 2), np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    uvs = np.ascontiguousarray(uvs, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    nt = len(indices)
    cap = 128 + nv * 24 + nt * 16
    out = np.empty(cap, np.uint8)
    size = ctypes.c_int()
    meshlets = ctypes.c_int()
    rc = lib.meshlet2_encode(
        positions.ctypes.data_as(f32p), normals.ctypes.data_as(f32p),
        uvs.ctypes.data_as(f32p), nv,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt,
        _u8(out), cap, ctypes.byref(size), ctypes.byref(meshlets))
    if rc != 0:
        raise RuntimeError(f"meshlet2_encode failed rc={rc}")
    return bytes(out[:size.value]), meshlets.value


def meshlet2_decode(blob: bytes, num_meshlets: int, max_vertices: int,
                    max_triangles: int):
    """Returns (positions (V,3), normals (V,3), uvs (V,2), indices
    (T,3))."""
    lib = get_lib()
    f32p = ctypes.POINTER(ctypes.c_float)
    data = np.frombuffer(blob, np.uint8)
    pos = np.empty((max_vertices, 3), np.float32)
    nrm = np.empty((max_vertices, 3), np.float32)
    uv = np.empty((max_vertices, 2), np.float32)
    idx = np.empty((max_triangles, 3), np.int32)
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.meshlet2_decode(
        _u8(data), len(data), num_meshlets,
        pos.ctypes.data_as(f32p), nrm.ctypes.data_as(f32p),
        uv.ctypes.data_as(f32p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError(f"meshlet2_decode failed rc={rc}")
    return (pos[:nv.value].copy(), nrm[:nv.value].copy(),
            uv[:nv.value].copy(), idx[:nt.value].copy())


def radix_sort_u64(keys: np.ndarray) -> np.ndarray:
    """Returns the ascending-order permutation (uint32)."""
    lib = get_lib()
    keys = np.ascontiguousarray(keys, np.uint64)
    order = np.empty(len(keys), np.uint32)
    lib.radix_sort_u64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(keys))
    return order


GTPX_FORMATS = {"rgba8": 0, "bc1": 1, "bc3": 3, "bc4": 4,
                "bc5": 5, "bc7": 7, "etc2": 8, "etc2a": 9,
                "etc2p": 10, "eac_r11": 11, "eac_rg11": 12,
                "bc6h": 13, "bc6h_s": 14}
# ASTC LDR, all 14 legal 2D footprints (texture_decoder.cpp:30-120).
GTPX_FORMATS.update({
    f"astc_{w}x{h}": 16 + i for i, (w, h) in enumerate(
        [(4, 4), (5, 4), (5, 5), (6, 5), (6, 6), (8, 5), (8, 6),
         (8, 8), (10, 5), (10, 6), (10, 8), (10, 10), (12, 10),
         (12, 12)])})


def gtpx_save(path: str, payload: bytes, fmt: str, width: int, height: int,
              levels: int = 1, flags: int = 0) -> None:
    lib = get_lib()
    hdr = np.zeros(32, np.uint8)
    n = lib.gtpx_write_header(_u8(hdr), GTPX_FORMATS[fmt], width, height,
                              levels, flags)
    with open(path, "wb") as f:
        f.write(bytes(hdr[:n]))
        f.write(payload)


def gtpx_load(path: str):
    """Returns (format_name, width, height, levels, flags, payload)."""
    lib = get_lib()
    data = np.fromfile(path, np.uint8)
    import ctypes as ct
    f = ct.c_uint32()
    w = ct.c_uint32()
    h = ct.c_uint32()
    l = ct.c_uint32()
    fl = ct.c_uint32()
    n = lib.gtpx_read_header(_u8(data), len(data), ct.byref(f), ct.byref(w),
                             ct.byref(h), ct.byref(l), ct.byref(fl))
    if n < 0:
        raise ValueError(f"bad GTPX file: {path} (rc={n})")
    names = {v: k for k, v in GTPX_FORMATS.items()}
    return (names[f.value], w.value, h.value, l.value, fl.value,
            bytes(data[n:]))
