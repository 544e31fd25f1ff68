#!/usr/bin/env python
"""Monocular EuRoC driver (reference: Examples/Monocular/mono_euroc.cc).

Usage: mono_euroc.py <settings.yaml> <mav0_dir> <timestamps.txt>
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orb_slam2_with_comment_tpu import Sensor, System
from orb_slam2_with_comment_tpu.runtime import enable_compilation_cache

enable_compilation_cache()
from orb_slam2_with_comment_tpu.dataio.datasets import EurocDataset


def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 1
    settings_path, mav_dir, times_path = argv[1], argv[2], argv[3]
    ds = EurocDataset(mav_dir, times_path, stereo=False)
    print(f"Loaded {len(ds)} frames from {mav_dir}")
    slam = System(settings_path=settings_path, sensor=Sensor.MONOCULAR)
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
