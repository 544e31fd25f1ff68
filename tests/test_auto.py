"""Autonomous on-device tracker (pipeline.auto.AutoTracker).

Verifies the zero-readback state machine reproduces the host-driven
Tracker's behavior on a synthetic RGB-D sequence: device-side
initialization gate, keyframe insertion via the on-device NeedNewKeyFrame
rules, accurate steady-state poses, ring-buffer trajectory export, and
lost-freeze semantics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.dataio.synthetic import (
    SyntheticWorld, orbit_trajectory)
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig
from orb_slam2_with_comment_tpu.pipeline import (
    AutoTracker, AutoTrackerConfig, TrackerConfig)


def _cfg(k_max=12, traj=None):
    return TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=k_max, n_feat=1000, l_max=6000, d_max=8),
        fps=30, depth_factor=1.0 / 5000.0)


def _frames(n):
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=n)
    frames = [(np.clip(img, 0, 255).astype(np.uint8),
               np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
              for img, depth in (world.render(R, t) for R, t in poses)]
    return frames, poses


@pytest.fixture(scope="module")
def tracked():
    n = 20
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    return tr.finalize(), poses, n


def test_initializes_and_tracks(tracked):
    out, poses, n = tracked
    assert out["initialized"]
    assert out["lost_at"] == -1
    assert out["n_frames"] == n
    assert out["valid"].all()


def test_keyframes_inserted_on_device(tracked):
    out, poses, n = tracked
    # on-device NeedNewKeyFrame fired at least a few times over the orbit
    assert 3 <= out["n_keyframes"] <= 12
    # stats column 6 records insertions; first frame is the init keyframe
    n_inserted = int(out["stats"][:, 6].sum())
    assert n_inserted == out["n_keyframes"]


def test_pose_accuracy_vs_ground_truth(tracked):
    out, poses, n = tracked
    errs = [np.linalg.norm(out["t"][i] - poses[i][1]) for i in range(n)]
    assert np.median(errs) < 0.02, f"median t err {np.median(errs)}"
    rot_errs = []
    for i in range(n):
        Rg = poses[i][0]
        cosang = (np.trace(out["R"][i] @ Rg.T) - 1) / 2
        rot_errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    assert np.median(rot_errs) < 1.0, f"median rot err {np.median(rot_errs)}"


def test_relative_chain_consistency(tracked):
    """Rcr/tcr must satisfy Tcw = Tcr * Trw with the logged ref keyframe's
    pose (reference: SaveTrajectoryTUM relative chain, System.cc:336-394).
    The per-frame absolute pose here is logged at the same map version, so
    the identity is exact up to float32."""
    out, poses, n = tracked
    # rebuild keyframe poses from the final map is not exported; instead
    # check internal consistency between frames sharing a ref keyframe:
    # Tc2w * Tc1w^-1 == Tc2r * Tc1r^-1 for equal ref.
    for i in range(1, n):
        if out["ref_kf"][i] != out["ref_kf"][i - 1]:
            continue
        R1, t1 = out["R"][i - 1], out["t"][i - 1]
        R2, t2 = out["R"][i], out["t"][i]
        rel_w = R2 @ R1.T
        Rr1, tr1 = out["Rcr"][i - 1], out["tcr"][i - 1]
        Rr2, tr2 = out["Rcr"][i], out["tcr"][i]
        rel_r = Rr2 @ Rr1.T
        assert np.allclose(rel_w, rel_r, atol=2e-3)


def test_trajectory_tum_lines():
    """trajectory_tum() lines agree with finalize(): one line per valid
    frame, strictly increasing timestamps, unit quaternions, and the
    translation column equals the camera center -R^T t."""
    n = 8
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    lines = tr.trajectory_tum()
    out = tr.finalize()
    valid_idx = [i for i in range(len(out["timestamps"])) if out["valid"][i]]
    assert len(lines) == len(valid_idx)
    prev_ts = -np.inf
    for line, i in zip(lines, valid_idx):
        parts = [float(x) for x in line.split()]
        assert len(parts) == 8
        ts, tx, ty, tz, qx, qy, qz, qw = parts
        assert ts > prev_ts
        prev_ts = ts
        assert abs(qx * qx + qy * qy + qz * qz + qw * qw - 1.0) < 1e-4
        R, t = out["R"][i], out["t"][i]
        C = -R.T @ t
        assert np.allclose([tx, ty, tz], C, atol=1e-5)


def test_tum_export_format():
    n = 8
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    lines = tr.trajectory_tum()
    assert len(lines) >= n - 1
    parts = lines[0].split()
    assert len(parts) == 8
    float(parts[0])  # timestamp parses


def test_ring_buffer_wrap():
    n = 12
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg(), AutoTrackerConfig(traj_capacity=8))
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    out = tr.finalize()
    # only the last 8 frames survive, in order
    assert len(out["timestamps"]) == 8
    assert out["n_frames"] == n
    assert out["valid"].shape[0] == 8


def test_no_init_on_black_frames():
    cfg = _cfg()
    tr = AutoTracker(cfg)
    img = np.zeros((cfg.height, cfg.width), np.uint8)
    depth = np.zeros((cfg.height, cfg.width), np.uint16)
    for _ in range(3):
        tr.process_rgbd(img, depth)
    out = tr.finalize()
    assert not out["initialized"]
    assert out["n_keyframes"] == 0
    assert not out["valid"].any()


def test_stereo_auto_tracks():
    """Autonomous stereo path: joint L/R extraction + row-band depth
    feeding the same on-device state machine."""
    FX, BF = 500.0, 40.0
    baseline = BF / FX
    n = 10
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=n)
    cfg = TrackerConfig(
        sensor="stereo", n_features=1000, min_init_features=200,
        bf=BF, fx=FX,
        map_cfg=MapConfig(k_max=12, n_feat=1000, l_max=6000, d_max=8),
        fps=30)
    tr = AutoTracker(cfg, AutoTrackerConfig(loop_closing=False))
    for R, t in poses:
        img_l, _ = world.render(R, t)
        t_r = np.asarray(t, np.float32) - np.array([baseline, 0, 0],
                                                   np.float32)
        img_r, _ = world.render(R, t_r)
        tr.process_stereo(np.clip(img_l, 0, 255).astype(np.uint8),
                          np.clip(img_r, 0, 255).astype(np.uint8))
    out = tr.finalize()
    assert out["initialized"] and out["lost_at"] == -1
    errs = [np.linalg.norm(out["t"][i] - poses[i][1]) for i in range(n)]
    assert np.median(errs) < 0.03, f"median stereo t err {np.median(errs)}"


def test_batched_dispatch_equivalence():
    """batch_frames > 1 scans several frames per dispatch; trajectories
    must match the per-frame dispatch path (within float noise — the scan
    compiles one shared body)."""
    n = 10
    frames, poses = _frames(n)
    a = AutoTracker(_cfg(), AutoTrackerConfig(loop_closing=False))
    b = AutoTracker(_cfg(), AutoTrackerConfig(loop_closing=False,
                                              batch_frames=4))
    for img, depth in frames:
        a.process_rgbd(img, depth)
    for img, depth in frames:
        b.process_rgbd(img, depth)
    oa, ob = a.finalize(), b.finalize()
    assert ob["initialized"] and ob["valid"].all()
    assert oa["n_keyframes"] == ob["n_keyframes"]
    assert np.allclose(oa["t"], ob["t"], atol=1e-3)


def test_localization_only_mode(tmp_path):
    """Localization mode: load a mapped session, track against the frozen
    map — no new keyframes (reference: ActivateLocalizationMode)."""
    from orb_slam2_with_comment_tpu.checkpoint import (
        load_auto_state, save_auto_state)
    n = 12
    frames, poses = _frames(n)
    mapper = AutoTracker(_cfg())
    for img, depth in frames:
        mapper.process_rgbd(img, depth)
    n_kf = mapper.finalize()["n_keyframes"]
    path = str(tmp_path / "map.npz")
    save_auto_state(path, mapper)
    loc = AutoTracker(_cfg(), AutoTrackerConfig(localization_only=True))
    load_auto_state(path, loc)
    for img, depth in frames:
        loc.process_rgbd(img, depth)
    out = loc.finalize()
    assert out["n_keyframes"] == n_kf  # map frozen
    assert out["lost_at"] == -1
    errs = [np.linalg.norm(out["t"][i] - poses[i % n][1])
            for i in range(len(out["valid"])) if out["valid"][i]]
    assert np.median(errs) < 0.02


def test_landmark_compaction_under_pressure():
    """With a small landmark capacity the pre-insert lifecycle must RECYCLE
    dead slots (mapstate.compact_landmarks runs on device, n_compact_lm
    counts the events) and keep creating landmarks + tracking accurately —
    not silently refuse creation at capacity (the round-2 failure mode)."""
    cfg = TrackerConfig(
        n_features=1000, min_init_features=200,
        map_cfg=MapConfig(k_max=12, n_feat=1000, l_max=2500, d_max=8),
        fps=30, depth_factor=1.0 / 5000.0)
    frames, poses = _frames(40)
    tr = AutoTracker(cfg, AutoTrackerConfig(loop_closing=False))
    for img, depth in frames:
        tr.process_rgbd(img, depth)
    out = tr.finalize()
    assert out["initialized"] and out["lost_at"] == -1
    assert out["valid"].all()
    # compaction actually fired, and rewound n_lm below the slots-created
    # high-water mark (proof of recycling, not refusal)
    n_compact = int(np.asarray(tr.state.n_compact_lm))
    assert n_compact >= 1, "landmark compaction never ran under pressure"
    n_lm = int(np.asarray(tr.state.map.n_lm))
    n_live = int(np.asarray(tr.state.map.lm_valid).sum())
    assert n_lm <= 2500
    assert n_live <= n_lm
    errs = [np.linalg.norm(out["t"][i] - poses[i][1]) for i in range(40)]
    assert np.median(errs) < 0.02


def test_auto_checkpoint_roundtrip(tmp_path):
    """save_auto_state/load_auto_state: a resumed AutoTracker continues
    tracking exactly where the saved one stopped."""
    from orb_slam2_with_comment_tpu.checkpoint import (
        load_auto_state, save_auto_state)
    n = 12
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    for img, depth in frames[:8]:
        tr.process_rgbd(img, depth)
    path = str(tmp_path / "auto_ckpt.npz")
    save_auto_state(path, tr)
    tr2 = AutoTracker(_cfg())
    load_auto_state(path, tr2)
    for img, depth in frames[8:]:
        tr.process_rgbd(img, depth)
        tr2.process_rgbd(img, depth)
    a, b = tr.finalize(), tr2.finalize()
    assert b["initialized"] and b["lost_at"] == -1
    assert np.allclose(a["t"][-4:], b["t"][-4:], atol=1e-5)
    assert a["n_keyframes"] == b["n_keyframes"]


def test_mono_auto_bootstrap_and_tracking():
    """Autonomous monocular path: on-device two-view H/F bootstrap,
    gauge fixing, triangulation-fed keyframes (up-to-scale accuracy)."""
    cfg = TrackerConfig(
        sensor="mono", n_features=800, min_init_features=150,
        min_init_matches=60,
        map_cfg=MapConfig(k_max=16, n_feat=800, l_max=6000, d_max=8),
        fps=10)
    world = SyntheticWorld(seed=1)
    poses = orbit_trajectory(n_frames=24, x_amp=0.5)
    tr = AutoTracker(cfg, AutoTrackerConfig(loop_closing=False))
    for R, t in poses:
        img, _ = world.render(R, t)
        tr.process_mono(img.astype(np.float32))
    out = tr.finalize()
    assert out["initialized"], "mono bootstrap never succeeded"
    assert out["lost_at"] == -1
    assert out["n_keyframes"] >= 2
    assert out["valid"].sum() >= 0.7 * len(poses)
    from orb_slam2_with_comment_tpu.evaluation.ate import (
        ate_rmse, camera_centers)
    sel = out["valid"]
    est_c = camera_centers(out["R"][sel], out["t"][sel])
    gt_c = camera_centers(
        np.stack([poses[i][0] for i in range(len(poses))])[sel],
        np.stack([poses[i][1] for i in range(len(poses))])[sel])
    # monocular gauge: Umeyama similarity alignment (scale + SE3)
    rmse = ate_rmse(est_c, gt_c, with_scale=True)
    assert rmse < 0.03, f"mono ATE (sim-aligned) {rmse}"


def test_lost_then_relocalizes_on_device():
    """Feature-free frames lose tracking (state freezes); re-showing a
    mapped view must trigger the on-device relocalization (BoW candidate
    -> EPnP RANSAC -> pose opt -> local refill, reference
    Tracking.cc:1582-1778) and resume tracking."""
    # enough frames that the map holds >5 keyframes before the kidnap:
    # with <=5 the tracker must RESET instead (reference Tracking.cc:542-551
    # — covered by test_lost_early_resets_on_device). Amortized maintenance
    # paces insertions at ~1 per 7 frames (c1b = mapping idle), so >5
    # keyframes needs ~40 build frames.
    n = 63
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    n_build = 60
    for img, depth in frames[:n_build]:
        tr.process_rgbd(img, depth)
    img0 = np.zeros((480, 640), np.uint8)
    d0 = np.zeros((480, 640), np.uint16)
    for _ in range(3):
        tr.process_rgbd(img0, d0)
    # revisit a mapped view -> relocalize, then keep tracking
    for img, depth in frames[2:5]:
        tr.process_rgbd(img, depth)
    out = tr.finalize()
    assert out["initialized"]
    assert out["valid"][:n_build].all()
    assert not out["valid"][n_build:n_build + 3].any()  # lost on black
    r = n_build + 3
    assert out["valid"][r:].all(), "did not relocalize on revisit"
    assert out["lost_at"] == -1  # recovered
    assert (out["stats"][r][6]) == 2  # reloc marker
    # recovered pose matches the revisited ground truth
    err = np.linalg.norm(out["t"][r] - poses[2][1])
    assert err < 0.05, f"reloc pose err {err}"


def test_lost_early_resets_on_device():
    """Lost with an immature map (<=5 keyframes) must RESET the whole
    tracker instead of staying LOST (reference: Tracking.cc:542-551), then
    re-initialize on the next good frames."""
    n = 12
    frames, poses = _frames(n)
    tr = AutoTracker(_cfg())
    for img, depth in frames[:4]:  # small map: <=2 keyframes
        tr.process_rgbd(img, depth)
    img0 = np.zeros((480, 640), np.uint8)
    d0 = np.zeros((480, 640), np.uint16)
    for _ in range(2):
        tr.process_rgbd(img0, d0)  # lose tracking -> reset branch
    for img, depth in frames[6:]:
        tr.process_rgbd(img, depth)  # fresh map re-initializes
    out = tr.finalize()
    assert out["initialized"], "did not re-initialize after reset"
    assert out["lost_at"] == -1
    # a reset marker (stats[6] == 3) appears after the kidnap
    assert (out["stats"][4:, 6] == 3).any()
    # the fresh map's keyframes restart from the re-initialization
    assert out["valid"][-3:].all()
