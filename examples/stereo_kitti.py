#!/usr/bin/env python
"""Stereo KITTI driver (reference: Examples/Stereo/stereo_kitti.cc).

Usage: stereo_kitti.py <settings.yaml> <sequence_dir> [--auto]

--auto runs the autonomous on-device tracker (pipeline.auto.AutoTracker):
joint L/R extraction, row-band stereo depth, keyframe maintenance and
loop closing all on device with zero per-frame host synchronization.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()
from orb_slam2_with_comment_tpu.dataio.datasets import KittiDataset


def main(argv):
    argv = list(argv)
    auto = "--auto" in argv
    if auto:
        argv.remove("--auto")
    if len(argv) < 3:
        print(__doc__)
        return 1
    kmax = None
    if "--kmax" in argv:  # explicit capacity (e.g. force slot recycling)
        i = argv.index("--kmax")
        kmax = int(argv[i + 1])
        del argv[i:i + 2]
    settings_path, seq_dir = argv[1], argv[2]
    ds = KittiDataset(seq_dir, stereo=True)
    print(f"Loaded {len(ds)} frames from {seq_dir}")
    if auto:
        from orb_slam2_with_comment_tpu.dataio.settings import (
            load_tracker_config)
        from orb_slam2_with_comment_tpu.pipeline import AutoTracker
        cfg = load_tracker_config(settings_path, expected_frames=len(ds),
                                  k_max=kmax)
        cfg.sensor = "stereo"
        tracker = AutoTracker(cfg)
        t0 = time.perf_counter()
        for ts, left, right in ds:
            tracker.process_stereo(left, right, timestamp=ts)
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
        # KITTI-format export, matching the non-auto driver
        # (System.cc:436-486 SaveTrajectoryKITTI semantics)
        with open("CameraTrajectory.txt", "w") as f:
            f.write("\n".join(tracker.trajectory_kitti()) + "\n")
        return 0
    slam = System(settings_path=settings_path, sensor=Sensor.STEREO,
                  expected_frames=len(ds))
    times = []
    for ts, left, right in ds:
        t0 = time.perf_counter()
        slam.track_stereo(left, right, ts)
        times.append(time.perf_counter() - t0)
    slam.shutdown()
    times.sort()
    n = len(times)
    print(f"median tracking time: {times[n // 2]:.4f}s  "
          f"mean: {sum(times) / n:.4f}s")
    slam.save_trajectory_kitti("CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
