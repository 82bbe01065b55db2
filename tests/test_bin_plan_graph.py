"""Cached binning plan through the REAL viewer graph (scene_viewer).

Drives SceneViewerApplication with the fused raster forced on CPU
(interpret-mode Pallas) and binPlanCache enabled, orbits the camera a
few frames with the plan carried as graph history, and asserts the
backbuffer is IDENTICAL to a plan-disabled app at every frame.
"""

import json
import os
import tempfile
import types

import numpy as np
import pytest

W, H = 192, 96


def _app(**cfg):
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    base = {"renderer": "deferred", "hdrBloom": True,
            "shadowMapResolution": 64, "postAA": "none",
            "fusedShade": False}
    base.update(cfg)
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(base, f)
        path = f.name
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=False))
    app.swapchain_updated(W, H)
    return app


@pytest.mark.slow
def test_bin_plan_graph_matches_unplanned(monkeypatch):
    monkeypatch.setenv("GRANITE_FORCE_FUSED_RASTER", "1")
    app_p = _app(binPlanCache="auto")
    app_r = _app(binPlanCache="false")
    assert app_p._bin_plan_enabled
    assert not app_r._bin_plan_enabled
    for i in range(3):
        # small per-frame yaw (the honest-orbit motion)
        for app in (app_p, app_r):
            app.camera.look_at(
                app.camera.position,
                np.asarray(app.camera.position)
                + _yawed_front(app, i * 0.01))
        f_p = np.asarray(app_p.render_frame(1 / 60, 0.1 + i / 60))
        f_r = np.asarray(app_r.render_frame(1 / 60, 0.1 + i / 60))
        assert np.array_equal(f_p, f_r), f"frame {i} diverged"
        # the carried plan must be live after frame 0
        assert int(np.asarray(app_p._history["bin-plan-flag"])[0]) == 1


def _yawed_front(app, yaw):
    from granite_tpu.math.muglm import quat_from_axis_angle, quat_rotate
    rot = np.asarray(app.camera.rotation)
    conj = np.array([rot[0], -rot[1], -rot[2], -rot[3]])
    q = quat_from_axis_angle([0.0, 1.0, 0.0], yaw)
    return np.asarray(quat_rotate(q, quat_rotate(conj, [0, 0, -1.0])))
