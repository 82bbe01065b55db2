"""scene-export parity tail: texture_utils / camera_export / tmx_parser
(reference scene-export/{texture_utils,camera_export,tmx_parser}.cpp)."""

import json
import os

import numpy as np
import pytest

from granite_tpu.scene_export.texture_utils import (
    TransparencyType, fixup_alpha_edges, generate_mipmaps,
    image_slice_contains_transparency, srgb_gamma_to_linear,
    srgb_linear_to_gamma, swizzle_image,
)
from granite_tpu.scene_export.camera_export import (
    RecordedCamera, export_cameras_to_json, import_cameras_from_json,
)


def test_srgb_roundtrip():
    v = np.linspace(0, 1, 64, dtype=np.float32)
    rt = srgb_linear_to_gamma(srgb_gamma_to_linear(v))
    assert np.allclose(rt, v, atol=1e-5)


def test_mip_chain_levels_and_average():
    img = np.zeros((64, 32, 4), np.uint8)
    img[:, :16] = [200, 100, 50, 255]
    img[:, 16:] = [100, 200, 150, 255]
    chain = generate_mipmaps(img)
    # 64x32 -> 32x16 -> ... -> 1x1
    assert len(chain) == 7
    assert chain[-1].shape == (1, 1, 4)
    # box-average invariant (linear space): the 1x1 tail equals the mean
    mean = img.astype(np.float64).mean(axis=(0, 1))
    assert np.allclose(chain[-1][0, 0], mean, atol=2.0)


def test_mip_chain_non_pow2():
    img = np.random.default_rng(0).integers(
        0, 255, (48, 20, 4), np.uint8) | np.uint8(0)
    img = img.astype(np.uint8)
    chain = generate_mipmaps(img)
    sizes = [c.shape[:2] for c in chain]
    assert sizes[0] == (48, 20) and sizes[1] == (24, 10)
    assert sizes[-1] == (1, 1)


def test_srgb_mips_filter_in_linear_space():
    # Half black / half white: linear-space average is NOT 127 in gamma
    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 3] = 255
    img[0, :, :3] = 255
    chain = generate_mipmaps(img, srgb=True)
    g = int(chain[-1][0, 0, 0])
    # linear avg 0.5 -> gamma ~188
    assert abs(g - 188) <= 2, g


def test_fixup_alpha_edges_bleeds_neighbours():
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 3] = 0
    img[1, 1] = [200, 40, 80, 255]
    out = fixup_alpha_edges(img)
    # opaque texel untouched
    assert tuple(out[1, 1]) == (200, 40, 80, 255)
    # transparent neighbour inherits its RGB (alpha stays 0)
    assert out[1, 2, 3] == 0
    assert np.allclose(out[1, 2, :3], [200, 40, 80], atol=1)
    # far corner has no opaque neighbour -> stays black
    assert tuple(out[3, 3, :3]) == (0, 0, 0)


def test_swizzle_identity_one_zero():
    img = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    out = swizzle_image(img, ("b", "g", "r", "one"))
    assert (out[..., 0] == img[..., 2]).all()
    assert (out[..., 2] == img[..., 0]).all()
    assert (out[..., 3] == 255).all()
    ident = swizzle_image(img, ("identity",) * 4)
    assert np.array_equal(ident, img)


def test_transparency_classification():
    img = np.full((4, 4, 4), 255, np.uint8)
    assert image_slice_contains_transparency(img) \
        == TransparencyType.NONE
    img[0, 0, 3] = 0
    assert image_slice_contains_transparency(img) \
        == TransparencyType.BINARY
    img[0, 1, 3] = 128
    assert image_slice_contains_transparency(img) \
        == TransparencyType.FLOATING


def test_camera_export_roundtrip():
    cams = [RecordedCamera(fovy=1.1, aspect=1.5, znear=0.2, zfar=500,
                           position=np.array([1, 2, 3], np.float32),
                           direction=np.array([0, 0, -1], np.float32),
                           up=np.array([0, 1, 0], np.float32))]
    text = export_cameras_to_json(cams)
    doc = json.loads(text)
    assert set(doc["cameras"][0]) == {"fovy", "aspect", "znear", "zfar",
                                      "direction", "position", "up"}
    back = import_cameras_from_json(text)
    assert back[0].fovy == pytest.approx(1.1)
    assert np.allclose(back[0].position, [1, 2, 3])


def test_tmx_parser(tmp_path):
    from granite_tpu.scene_export.tmx_parser import (
        NO_TILE, DrawPipeline, TMXParser,
    )
    # 2-tile tileset image: tile0 opaque red, tile1 binary-transparent
    tw = th = 4
    atlas = np.zeros((th, 2 * tw, 4), np.uint8)
    atlas[:, :tw] = [255, 0, 0, 255]
    atlas[:, tw:] = [0, 255, 0, 255]
    atlas[0, tw, 3] = 0
    doc = {
        "width": 2, "height": 2, "tilewidth": tw, "tileheight": th,
        "orientation": "orthogonal", "renderorder": "right-down",
        "layers": [{
            "type": "tilelayer", "width": 2, "height": 2,
            "visible": True, "opacity": 0.5, "id": 1,
            "data": [1, 2, 0, 1],
            "properties": [
                {"name": "speed", "type": "float", "value": 2.5},
                {"name": "tint", "type": "color", "value": "#80FF0000"},
            ],
        }],
        "tilesets": [{
            "tilecount": 2, "firstgid": 1, "margin": 0, "spacing": 0,
            "columns": 2, "image": "tiles.npy",
        }],
    }
    p = tmp_path / "map.json"
    p.write_text(json.dumps(doc))
    np.save(tmp_path / "tiles.npy", atlas)
    parser = TMXParser(str(p),
                       image_loader=lambda path: np.load(path + ".npy")
                       if not os.path.exists(path) else np.load(path))
    assert parser.get_map_tiles() == (2, 2)
    assert parser.get_tile_size() == (4, 4)
    layer = parser.get_layers()[0]
    assert layer.opacity == pytest.approx(0.5)
    assert layer.tile_indices.tolist() == [[0, 1], [NO_TILE, 0]]
    assert layer.properties["speed"] == pytest.approx(2.5)
    assert tuple(layer.properties["tint"]) == (255, 0, 0, 128)
    tiles = parser.get_tiles()
    assert tiles[0].pipeline == DrawPipeline.OPAQUE
    assert tiles[1].pipeline == DrawPipeline.ALPHA_TEST
    tm = parser.get_tilemap_image()
    assert tm.shape == (2, th, tw, 4)
