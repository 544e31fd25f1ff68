"""AR demo: batched plane RANSAC + plane pose + overlay rendering
(reference: Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc:392-585)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_with_comment_tpu.models.camera import PinholeCamera
from orb_slam2_with_comment_tpu.visualization.ar import (
    detect_plane, draw_ar, fit_plane_ransac, plane_pose, refit_plane)


def _make_points(rng, n_in=120, n_out=40, normal=(0.0, 1.0, 0.0), d=-1.5,
                 noise=0.002):
    normal = np.asarray(normal, np.float32)
    normal = normal / np.linalg.norm(normal)
    # basis in the plane
    a = np.array([1.0, 0.0, 0.0], np.float32)
    if abs(normal @ a) > 0.9:
        a = np.array([0.0, 0.0, 1.0], np.float32)
    e1 = np.cross(normal, a); e1 /= np.linalg.norm(e1)
    e2 = np.cross(normal, e1)
    uv = rng.uniform(-2, 2, (n_in, 2)).astype(np.float32)
    base = -d * normal  # point on plane: n.x + d = 0
    pts_in = base + uv[:, :1] * e1 + uv[:, 1:] * e2
    pts_in += noise * rng.randn(n_in, 3).astype(np.float32)
    pts_out = rng.uniform(-3, 3, (n_out, 3)).astype(np.float32)
    pts = np.concatenate([pts_in, pts_out]).astype(np.float32)
    return pts, n_in


def test_plane_ransac_recovers_plane():
    rng = np.random.RandomState(3)
    pts, n_in = _make_points(rng)
    valid = np.ones(len(pts), bool)
    n, d, inliers, ok = fit_plane_ransac(
        jnp.asarray(pts), jnp.asarray(valid), jax.random.PRNGKey(0))
    assert bool(ok)
    n = np.asarray(n)
    assert abs(abs(n[1]) - 1.0) < 0.02  # normal ~ +-Y
    # The 1.4 * (20th-percentile) threshold (ViewerAR.cc:473-484) is
    # scale-invariant: it keeps the tightest ~40% of Gaussian-noise
    # inliers and excludes outliers.
    inl = np.asarray(inliers)
    assert inl[:n_in].mean() > 0.2
    assert inl[n_in:].mean() < 0.1
    # refit from those inliers recovers the plane precisely
    normal, origin = refit_plane(jnp.asarray(pts), inliers)
    assert abs(abs(float(np.asarray(normal)[1])) - 1.0) < 1e-3
    assert abs(float(np.asarray(origin)[1]) - 1.5) < 0.01  # on plane y=1.5


def test_refit_and_pose_orientation():
    rng = np.random.RandomState(7)
    pts, n_in = _make_points(rng, normal=(0.2, 0.9, 0.1), d=-1.0)
    inliers = np.zeros(len(pts), bool)
    inliers[:n_in] = True
    normal, origin = refit_plane(jnp.asarray(pts), jnp.asarray(inliers))
    true_n = np.array([0.2, 0.9, 0.1]); true_n /= np.linalg.norm(true_n)
    assert abs(abs(float(np.asarray(normal) @ true_n)) - 1.0) < 1e-3
    # plane frame: +Y column of Rpw must align with the (sign-fixed) normal
    cam_center = jnp.zeros(3)
    Rpw, opw = plane_pose(normal, origin, cam_center, jnp.float32(0.3))
    Rpw = np.asarray(Rpw)
    assert np.allclose(Rpw @ Rpw.T, np.eye(3), atol=1e-5)
    y_axis = Rpw[:, 1]
    xc = np.asarray(cam_center - origin)
    assert float(xc @ y_axis) <= 1e-5  # normal points away from camera ray
    assert abs(abs(y_axis @ true_n) - 1.0) < 1e-3


def test_detect_plane_too_few_points_returns_none():
    pts = np.zeros((100, 3), np.float32)
    valid = np.zeros(100, bool)
    valid[:30] = True
    out = detect_plane(pts, valid, np.eye(3), np.zeros(3),
                       jax.random.PRNGKey(1))
    assert out is None


def test_draw_ar_renders_cube_pixels():
    rng = np.random.RandomState(0)
    pts, _ = _make_points(rng, d=-0.0)  # plane through origin, normal +Y
    valid = np.ones(len(pts), bool)
    Rcw = np.eye(3, dtype=np.float32)
    tcw = np.array([0.0, 0.0, 2.5], np.float32)  # camera looks at plane
    out = detect_plane(pts, valid, Rcw, tcw, jax.random.PRNGKey(2))
    assert out is not None
    Rpw, opw, inliers = out
    assert inliers.sum() >= 30  # ~40% of 120 true inliers (see above)
    cam = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)
    img = np.full((480, 640), 50, np.uint8)
    over = draw_ar(img, cam, Rcw, tcw, Rpw, opw, cube_size=0.3)
    assert over.shape == (480, 640, 3)
    # cube wireframe color must appear
    magenta = (over == np.array([235, 60, 200])).all(axis=2)
    assert magenta.sum() > 50
