#!/usr/bin/env python
"""Stereo EuRoC driver with online rectification (reference:
Examples/Stereo/stereo_euroc.cc:97-137 — initUndistortRectifyMap from the
YAML LEFT./RIGHT. blocks, remap per frame, then System::TrackStereo).

Usage: stereo_euroc.py <settings.yaml> <mav0_dir> <timestamps.txt>
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()
from orb_slam2_with_comment_tpu.dataio.datasets import EurocDataset
from orb_slam2_with_comment_tpu.dataio.rectify import StereoRectifier
from orb_slam2_with_comment_tpu.dataio.settings import load_settings


def main(argv):
    argv = list(argv)
    auto = "--auto" in argv
    if auto:
        argv.remove("--auto")
    if len(argv) < 4:
        print(__doc__)
        return 1
    settings_path, mav_dir, times_path = argv[1], argv[2], argv[3]
    s = load_settings(settings_path)
    if s.left_rect is None:
        print("settings file has no LEFT./RIGHT. rectification blocks")
        return 1
    rect = StereoRectifier(s.left_rect, s.right_rect, s.width, s.height)
    ds = EurocDataset(mav_dir, times_path, stereo=True)
    print(f"Loaded {len(ds)} frames from {mav_dir}")
    if auto:
        import numpy as np
        from orb_slam2_with_comment_tpu.dataio.settings import (
            load_tracker_config)
        from orb_slam2_with_comment_tpu.pipeline import AutoTracker
        cfg = load_tracker_config(settings_path, expected_frames=len(ds))
        cfg.sensor = "stereo"
        tracker = AutoTracker(cfg)
        t0 = time.perf_counter()
        for ts, left, right in ds:
            # online rectification stays on device (dataio.rectify), the
            # rectified pair feeds the autonomous step
            left_r, right_r = rect(left, right)
            tracker.process_stereo(left_r, right_r, timestamp=ts)
        tracker.sync()
        dt = time.perf_counter() - t0
        out = tracker.finalize()
        print(f"{out['n_frames']} frames in {dt:.2f}s "
              f"({out['n_frames'] / dt:.1f} fps), "
              f"{out['n_keyframes']} keyframes, "
              f"{out['n_loops_closed']} loops closed, "
              f"lost_at={out['lost_at']}")
        from _util import write_run_summary
        write_run_summary(out, dt)
        with open("CameraTrajectory.txt", "w") as f:
            f.write("\n".join(tracker.trajectory_tum()) + "\n")
        return 0
    slam = System(settings_path=settings_path, sensor=Sensor.STEREO,
                  expected_frames=len(ds))
    times = []
    for ts, left, right in ds:
        t0 = time.perf_counter()
        left_r, right_r = rect(left, right)
        slam.track_stereo(left_r, right_r, ts)
        times.append(time.perf_counter() - t0)
    slam.shutdown()
    times.sort()
    n = len(times)
    print(f"median tracking time: {times[n // 2]:.4f}s  "
          f"mean: {sum(times) / n:.4f}s")
    slam.save_trajectory_tum("CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
