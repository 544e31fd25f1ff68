#!/usr/bin/env python
"""Monocular TUM driver (reference: Examples/Monocular/mono_tum.cc:36-125).

Usage: mono_tum.py <settings.yaml> <sequence_dir> [--auto]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()
from orb_slam2_with_comment_tpu.dataio.datasets import TumMonoDataset


def main(argv):
    argv = list(argv)
    auto = "--auto" in argv
    if auto:
        argv.remove("--auto")
    if len(argv) < 3:
        print(__doc__)
        return 1
    settings_path, seq_dir = argv[1], argv[2]
    ds = TumMonoDataset(seq_dir)
    print(f"Loaded {len(ds)} frames from {seq_dir}")
    if auto:
        from orb_slam2_with_comment_tpu.dataio.settings import (
            load_tracker_config)
        from orb_slam2_with_comment_tpu.pipeline import AutoTracker
        cfg = load_tracker_config(settings_path, expected_frames=len(ds),
                                  sensor="mono")
        cfg.sensor = "mono"
        tracker = AutoTracker(cfg)
        t0 = time.perf_counter()
        for ts, img in ds:
            tracker.process_mono(img, timestamp=ts)
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
    slam = System(settings_path=settings_path, sensor=Sensor.MONOCULAR,
                  expected_frames=len(ds))
    times = []
    for ts, img in ds:
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
    slam.shutdown()
    times.sort()
    n = len(times)
    print(f"median tracking time: {times[n // 2]:.4f}s  "
          f"mean: {sum(times) / n:.4f}s")
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
