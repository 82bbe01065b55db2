"""GPU-LOD grid tests: ocean displacement mips (ocean.cpp cull_blocks /
ocean-lods analogue) and GroundLOD clipmap terrain (ground.hpp:94)."""

import json
import tempfile
import types

import jax.numpy as jnp
import numpy as np

from granite_tpu.renderer.ground import GroundLOD, fbm_heightmap
from granite_tpu.renderer.ocean import Ocean, OceanConfig


def test_ocean_fft_pass_emits_mip_stack():
    oc = Ocean(OceanConfig(fft_resolution=64, grid_resolution=16))
    ctx = types.SimpleNamespace(params={"ocean_time": jnp.float32(1.0)})
    maps = oc.fft_pass(ctx)["ocean-maps"]
    assert maps.ndim == 4 and maps.shape[1:] == (64, 64, 5)
    assert maps.shape[0] >= 2
    # level 1 occupies the top-left quadrant (build_mips layout)
    assert float(jnp.abs(maps[1, :32, :32]).sum()) > 0.0


def test_ocean_lod_smooths_far_vertices():
    """Far vertices sample coarse mips: displacement variance shrinks
    with distance (the anti-shimmer contract of the LOD grid)."""
    oc = Ocean(OceanConfig(fft_resolution=64, grid_resolution=16,
                           world_size=64.0))
    ctx = types.SimpleNamespace(params={"ocean_time": jnp.float32(2.0)})
    maps = oc.fft_pass(ctx)["ocean-maps"]
    n = 512
    rng = np.random.RandomState(0)
    xz = rng.uniform(-32, 32, (n, 2)).astype(np.float32)
    pos = jnp.asarray(np.stack([xz[:, 0], np.zeros(n, np.float32),
                                xz[:, 1]], -1))
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    mask = jnp.ones(n, bool)
    near_cam = jnp.asarray([0.0, 2.0, 0.0])
    far_cam = jnp.asarray([4000.0, 2.0, 0.0])
    p_near, _ = oc.displace(pos, nrm, mask, maps, camera_pos=near_cam)
    p_far, _ = oc.displace(pos, nrm, mask, maps, camera_pos=far_cam)
    var_near = float(np.var(np.asarray(p_near[:, 1])))
    var_far = float(np.var(np.asarray(p_far[:, 1])))
    assert var_far < var_near * 0.9, (var_near, var_far)
    # No-camera path still works (LOD 0 everywhere).
    p0, _ = oc.displace(pos, nrm, mask, maps)
    assert np.asarray(p0).shape == (n, 3)


def test_ground_lod_displaces_and_smooths():
    hm = fbm_heightmap(n=128, amplitude=3.0, seed=2)
    g = GroundLOD(hm, world_size=64.0, grid=64)
    n = 400
    rng = np.random.RandomState(1)
    xz = rng.uniform(-31, 31, (n, 2)).astype(np.float32)
    pos = jnp.asarray(np.stack([xz[:, 0], np.zeros(n, np.float32),
                                xz[:, 1]], -1))
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    mask = jnp.ones(n, bool)
    near, nn = g.displace(pos, nrm, mask, jnp.asarray([0.0, 1.0, 0.0]))
    far, _ = g.displace(pos, nrm, mask, jnp.asarray([9000.0, 1.0, 0.0]))
    hn = np.asarray(near[:, 1])
    hf = np.asarray(far[:, 1])
    assert hn.std() > 0.1                      # actually displaced
    assert hf.std() < hn.std()                 # coarser far LOD
    # means agree (mips preserve the average height)
    assert abs(hn.mean() - hf.mean()) < 0.2
    # normals renormalized and upward
    nv = np.asarray(nn)
    assert np.allclose((nv * nv).sum(-1), 1.0, atol=1e-4)
    assert (nv[:, 1] > 0).all()
    # masked-out vertices untouched
    m2 = jnp.zeros(n, bool)
    same, _ = g.displace(pos, nrm, m2, jnp.asarray([0.0, 1.0, 0.0]))
    assert np.allclose(np.asarray(same), np.asarray(pos))


def test_viewer_lod_terrain_renders():
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    cfg = {"renderer": "forward", "hdrBloom": False,
           "shadowMapResolution": 32, "clusteredLightsShadows": False,
           "terrain": True}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    # The LOD knob arrives via the .scene composition loader.
    import os
    d = tempfile.mkdtemp()
    scene_path = os.path.join(d, "t.scene")
    with open(scene_path, "w") as f:
        json.dump({"scenes": [], "terrain": {"lod": True,
                                             "worldSize": 40.0,
                                             "amplitude": 2.0,
                                             "grid": 32}}, f)
    app3 = SceneViewerApplication(types.SimpleNamespace(
        scene=scene_path, config=path, camera_index=-1,
        bench_scene=False))
    assert app3.ground is not None
    app3.swapchain_updated(96, 54)
    out = np.asarray(app3.render_frame(1 / 60, 0.0))
    assert out.shape == (54, 96, 4)
    assert (out[..., :3] > 0).any()
