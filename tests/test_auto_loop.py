"""On-device loop closing (pipeline.auto_loop).

A controlled loop scenario: keyframes around a full orbit that returns to
its start, with drift injected into the later keyframe poses (the frames
are rendered at TRUE poses — the drifted pose is only what the map is
told, exactly what accumulated tracking drift does). The device-side
pipeline must: detect the revisit via BoW + covisibility-consistency over
3 consecutive keyframes (reference: LoopClosing.cc:43,164-244), solve the
drift as a Sim3 (ComputeSim3 :291-487), and correct the map
(CorrectLoop :509-719) so the final keyframe's pose error shrinks by an
order of magnitude.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.frontend import OrbExtractor
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig, empty_map
from orb_slam2_with_comment_tpu.pipeline import TrackerConfig
from orb_slam2_with_comment_tpu.pipeline import auto_loop, steps
from orb_slam2_with_comment_tpu.place.vocabulary import (
    load_default_vocabulary)

DRIFT_STEP = np.array([0.015, 0.0, 0.008], np.float32)


@pytest.fixture(scope="module")
def loop_run():
    cfg = TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=20, n_feat=1000, l_max=10000, d_max=8),
        fps=30, depth_factor=1.0)
    world = SyntheticWorld(seed=1)
    lap = orbit_trajectory(n_frames=14)
    poses = lap + lap[:4]  # dwell on the revisited views
    ext = OrbExtractor(n_features=1000)
    voc = load_default_vocabulary(as_numpy=True)
    cam = cfg.cam
    m = empty_map(cfg.map_cfg)
    loop = auto_loop.empty_loop_carry(cfg.map_cfg.k_max, 1000)
    step = jax.jit(lambda lp, mm, kk: auto_loop.close_loop_step(
        lp, mm, cam, kk, voc, fix_scale=True))

    drift = np.zeros(3, np.float32)
    err_before = None
    events = []
    for k, (R, t) in enumerate(poses):
        img, depth = world.render(R, t)
        img = np.clip(img, 0, 255).astype(np.float32)
        feats, d = steps.extract_rgbd_features(
            ext, cam, jnp.asarray(img), jnp.asarray(depth),
            jnp.float32(1.0), cfg.width, cfg.height)
        obs = steps.FrameObs(feats, d, jnp.full(d.shape[0], -1, jnp.int32))
        if 8 <= k < 14:
            drift = drift + DRIFT_STEP
        m = steps.keyframe_step(
            m, cam, obs, jnp.asarray(R), jnp.asarray(t + drift),
            jnp.int32(k), jnp.float32(cfg.depth_threshold),
            cfg.width, cfg.height)
        n_before = int(loop.n_loops)
        if err_before is None and n_before == 0:
            err_now = np.linalg.norm(np.asarray(m.kf_t[k]) - poses[k][1])
        m, loop = step(loop, m, jnp.int32(k))
        if int(loop.n_loops) > n_before:
            err_before = err_now
            events.append(k)
    return m, loop, poses, events, err_before


def test_loop_detected_after_consistency(loop_run):
    m, loop, poses, events, err_before = loop_run
    assert int(loop.n_loops) >= 1, "no loop closed over a perfect revisit"
    # fired near the end of the lap (with SearchBySim3 match growing the
    # orbit's own overlap closes a correct loop at k=12, one keyframe
    # before the literal revisit) and never before the 3-consecutive-
    # keyframe consistency chain could build
    assert events[0] >= 10


def test_loop_correction_reduces_drift(loop_run):
    m, loop, poses, events, err_before = loop_run
    k = events[0]
    err_after = np.linalg.norm(np.asarray(m.kf_t[k]) - poses[k][1])
    assert err_before > 0.05  # the injected drift was substantial
    assert err_after < 0.35 * err_before, (
        f"loop correction did not reduce drift: {err_before} -> {err_after}")


def test_map_stays_finite_and_anchored(loop_run):
    m, loop, poses, events, err_before = loop_run
    assert np.isfinite(np.asarray(m.kf_t)).all()
    assert np.isfinite(np.asarray(m.lm_pw)).all()
    # gauge keyframe untouched by correction (fixed in graph + GBA)
    assert np.allclose(np.asarray(m.kf_t[0]), poses[0][1], atol=1e-3)


def test_no_spurious_loops_without_revisit():
    """A half-orbit never revisits: the detector must stay silent."""
    cfg = TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=20, n_feat=1000, l_max=10000, d_max=8),
        fps=30, depth_factor=1.0)
    world = SyntheticWorld(seed=2)
    poses = orbit_trajectory(n_frames=28)[:12]
    ext = OrbExtractor(n_features=1000)
    voc = load_default_vocabulary(as_numpy=True)
    cam = cfg.cam
    m = empty_map(cfg.map_cfg)
    loop = auto_loop.empty_loop_carry(cfg.map_cfg.k_max, 1000)
    step = jax.jit(lambda lp, mm, kk: auto_loop.close_loop_step(
        lp, mm, cam, kk, voc, fix_scale=True))
    for k, (R, t) in enumerate(poses):
        img, depth = world.render(R, t)
        img = np.clip(img, 0, 255).astype(np.float32)
        feats, d = steps.extract_rgbd_features(
            ext, cam, jnp.asarray(img), jnp.asarray(depth),
            jnp.float32(1.0), cfg.width, cfg.height)
        obs = steps.FrameObs(feats, d, jnp.full(d.shape[0], -1, jnp.int32))
        m = steps.keyframe_step(
            m, cam, obs, jnp.asarray(R), jnp.asarray(t), jnp.int32(k),
            jnp.float32(cfg.depth_threshold), cfg.width, cfg.height)
        m, loop = step(loop, m, jnp.int32(k))
    assert int(loop.n_loops) == 0


def test_dataset_scale_paths_trace():
    """The bounded top-E edge extraction (k_max > 64) and the CG
    essential-graph solve (k_max > 256) must trace with consistent shapes
    — these are the dataset-scale paths no small-map test compiles.
    jax.eval_shape traces abstractly (no compilation), so this stays
    cheap while catching shape/type breakage."""
    import jax
    from orb_slam2_with_comment_tpu.pipeline import TrackerConfig
    for k_max in (96, 300):
        cfg = TrackerConfig(
            n_features=200, min_init_features=50,
            map_cfg=MapConfig(k_max=k_max, n_feat=200, l_max=3000, d_max=6),
            fps=30, depth_factor=1.0)
        voc = load_default_vocabulary(as_numpy=True)
        m = empty_map(cfg.map_cfg)
        loop = auto_loop.empty_loop_carry(k_max, 200)
        cam = cfg.cam

        def step(lp, mm, kk):
            return auto_loop.close_loop_step(
                lp, mm, cam, kk, voc, fix_scale=True,
                width=cfg.width, height=cfg.height)

        out_m, out_loop = jax.eval_shape(step, loop, m, jnp.int32(3))
        assert out_m.kf_R.shape == (k_max, 3, 3)
        assert out_loop.bow_idx.shape[0] == k_max
