#!/usr/bin/env python
"""glTF repacker (reference: tools/gltf_repacker.cpp — mesh dedup/optimize
and texture compression to the engine container).

  python tools/gltf_repacker.py --input in.gltf --output out.gltf \
      [--compress-textures] [--meshlets]

- vertex deduplication + index rebuild per mesh,
- optional BC1 compression of baseColor textures into .gtpx sidecars
  (via the native codec),
- optional meshlet encoding stats (native meshlet codec).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from granite_tpu.scene.gltf import GLTFParser
from granite_tpu.scene_export import export_gltf


def dedup_mesh(md) -> tuple:
    """Weld identical vertices (position+normal+uv), rebuild indices."""
    key = np.concatenate([md.positions, md.normals, md.uvs], axis=1)
    uniq, inverse = np.unique(key.round(6), axis=0, return_inverse=True)
    # map old->new: pick the first occurrence for attribute fidelity
    first = np.full(len(uniq), -1, np.int64)
    for i, g in enumerate(inverse):
        if first[g] < 0:
            first[g] = i
    before = len(md.positions)
    md.positions = md.positions[first]
    md.normals = md.normals[first]
    md.uvs = md.uvs[first]
    md.tangents = md.tangents[first] if md.tangents is not None else None
    md.indices = inverse[md.indices].astype(np.int32)
    return before, len(md.positions)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--compress-textures", action="store_true")
    ap.add_argument("--meshlets", action="store_true")
    args = ap.parse_args(argv)

    info = GLTFParser(args.input).get_scene()
    total_before = total_after = 0
    for md in info.meshes:
        b, a = dedup_mesh(md)
        total_before += b
        total_after += a
    print(f"vertices: {total_before} -> {total_after} "
          f"({100 * (1 - total_after / max(total_before, 1)):.1f}% saved)")

    if args.compress_textures:
        # Format selection like texture_compression.cpp: alpha-carrying
        # images -> BC3, normal maps -> BC5 (RGTC XY), opaque color ->
        # BC1.
        from granite_tpu.native import (
            encode_bc1, encode_bc3, encode_bc5, gtpx_save,
        )
        normal_imgs = {m.normal_image for m in info.materials
                       if m.normal_image is not None}
        outdir = os.path.dirname(os.path.abspath(args.output))
        for i, img in enumerate(info.images):
            img = np.ascontiguousarray(img)
            if i in normal_imgs:
                fmt, blocks = "bc5", encode_bc5(img)
            elif img.shape[-1] == 4 and (img[..., 3] != 255).any():
                fmt, blocks = "bc3", encode_bc3(img)
            else:
                fmt, blocks = "bc1", encode_bc1(img)
            path = os.path.join(outdir, f"tex{i}.gtpx")
            gtpx_save(path, bytes(blocks), fmt, img.shape[1],
                      img.shape[0])
            raw = img.nbytes
            print(f"  tex{i}: {raw} -> {len(blocks)} bytes "
                  f"({fmt.upper()}) {path}")

    if args.meshlets:
        from granite_tpu.native import meshlet_encode
        for i, md in enumerate(info.meshes):
            blob, n = meshlet_encode(md.positions, md.indices)
            raw = md.positions.nbytes + md.indices.nbytes
            print(f"  mesh{i}: {n} meshlets, {raw} -> {len(blob)} bytes")

    export_gltf(info, args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
