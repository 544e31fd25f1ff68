"""Runtime knobs: persistent compilation cache, profiling helpers.

The SLAM pipeline compiles ~20 distinct XLA programs (fused track step,
keyframe maintenance, relocalization RANSAC, loop-closing stack). On a
remote-attached TPU the first-run compile cost dominates short sequences,
so drivers enable JAX's persistent compilation cache: second and later
runs of any driver reuse every program.
"""
from __future__ import annotations

import os

import jax


def _host_fingerprint() -> str:
    """Hash of this host's CPU identity. XLA:CPU AOT executables are
    compiled against the build machine's feature set; loading an entry
    cached by a DIFFERENT machine (shared $HOME across heterogeneous
    hosts) warns `cpu_aot_loader`, can SIGILL mid-suite, and — subtler —
    can produce last-ulp float divergence between fresh and foreign-
    compiled programs of the same computation. /proc/cpuinfo `flags`
    alone proved insufficient (two hosts with identical flag lines
    compiled with different XLA target features, e.g. amx-fp16); include
    the model name and microcode revision, plus the jax version whose
    codegen the entries embed."""
    import hashlib
    key = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("flags", "model name", "microcode",
                                  "stepping")):
                    key.append(ln.strip())
                if len(key) >= 4:
                    break
    except OSError:
        import platform
        key.append(platform.processor())
    key.append("jax=" + jax.__version__)
    return hashlib.sha256("|".join(sorted(set(key))).encode()
                          ).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get(
        "ORB_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/orb_tpu_xla-" + _host_fingerprint()))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


class AsyncUploader:
    """Background-thread host->device transfer pipeline.

    On a remote-attached TPU a blocking device_put costs a full tunnel
    round trip (~25-50 ms measured); uploading frame k+1 on a worker
    thread while the tracker computes frame k hides that latency entirely
    (the GIL releases during the transfer). Usage:

        up = AsyncUploader()
        fut = up.put(img0, depth0)
        for k in ...:
            arrs = fut.result()
            fut = up.put(img_next, depth_next)
            tracker.process_rgbd(*arrs, frame_id=k)
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=1)

    def put(self, *arrays):
        import numpy as np

        def _upload(arrs):
            return tuple(jax.device_put(np.asarray(a, np.float32))
                         for a in arrs)

        return self._pool.submit(_upload, arrays)


class StageTimer:
    """Lightweight per-stage wall-clock accumulator (the reference's only
    metric was per-frame time in the example mains; SURVEY §5 asks for
    first-class stage timing)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def add(self, stage: str, dt: float) -> None:
        self.totals[stage] = self.totals.get(stage, 0.0) + dt
        self.counts[stage] = self.counts.get(stage, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "n": self.counts[k],
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 2)}
                for k, v in sorted(self.totals.items())}
