"""Live web viewer: state snapshot, frame overlay, control round trip."""
import json
import urllib.request

import numpy as np

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import TrackerConfig


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def _post(port, path, doc):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(doc).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_viewer_end_to_end():
    cfg = TrackerConfig(
        n_features=600, min_init_features=150,
        map_cfg=MapConfig(k_max=6, n_feat=600, l_max=3000, d_max=8), fps=10)
    slam = System(config=cfg, sensor=Sensor.RGBD, use_viewer=True,
                  viewer_port=0)
    port = slam.viewer.port
    try:
        world = SyntheticWorld(seed=1)
        for k, (R, t) in enumerate(orbit_trajectory(n_frames=8)):
            img, depth = world.render(R, t)
            slam.track_rgbd(img, depth, timestamp=k / 10.0)
        slam.tracker.flush()

        page = _get(port, "/")
        assert b"live viewer" in page

        doc = json.loads(_get(port, "/state.json"))
        assert doc["state"] == "OK"
        assert len(doc["points"]) > 100
        assert len(doc["keyframes"]) >= 1
        assert doc["camera"] is not None

        png = _get(port, "/frame.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # localization-mode switch drives the System mode (Viewer.cc:116-125)
        _post(port, "/control", {"localization": True})
        assert slam.tracker.localization_only
        _post(port, "/control", {"localization": False})
        assert not slam.tracker.localization_only

        # reset rebuilds the tracker (Viewer "Reset" button)
        _post(port, "/control", {"reset": True})
        assert slam.tracker.n_kf_host == 0
    finally:
        slam.shutdown()
