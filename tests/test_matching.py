import numpy as np
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.matching import core, search
from orb_slam2_with_comment_tpu.matching.search import FeatureSet, LandmarkSet
from orb_slam2_with_comment_tpu.optim.residuals import CamParams
from orb_slam2_with_comment_tpu.geometry import se3

rng = np.random.RandomState(11)
CAM = CamParams(*[jnp.float32(v) for v in (500.0, 500.0, 320.0, 240.0, 40.0)])
W, H = 640, 480


def random_desc(n):
    return rng.randint(0, 2**32, (n, 8), dtype=np.uint32)


def feats_from(xy, desc, octave=None, ur=None, angle=None, valid=None):
    n = len(xy)
    return FeatureSet(
        jnp.asarray(xy, jnp.float32),
        jnp.asarray(ur if ur is not None else -np.ones(n), jnp.float32),
        jnp.asarray(octave if octave is not None else np.zeros(n, np.int32)),
        jnp.asarray(angle if angle is not None else np.zeros(n, np.float32)),
        jnp.asarray(desc),
        jnp.asarray(valid if valid is not None else np.ones(n, bool)),
    )


class TestCore:
    def test_dedupe(self):
        idx = jnp.asarray([0, 0, 1], jnp.int32)
        dist = jnp.asarray([5, 3, 7], jnp.int32)
        matched = jnp.asarray([True, True, True])
        keep = core.dedupe_matches(idx, dist, matched, 4)
        np.testing.assert_array_equal(np.asarray(keep), [False, True, True])

    def test_rotation_consistency(self):
        # 90 matches in bin of 0 rad diff, 5 in a stray bin -> stray dropped
        bins = core.rotation_bins(
            jnp.concatenate([jnp.zeros(90), jnp.full(5, 2.0)]), jnp.zeros(95))
        matched = jnp.ones(95, bool)
        keep = core.rotation_consistency(bins, matched)
        assert bool(keep[:90].all())
        assert not bool(keep[90:].any())

    def test_windowed_match_ratio(self):
        d = np.zeros((1, 8), np.uint32)
        t = np.zeros((2, 8), np.uint32)
        t[0, 0] = (1 << 30) - 1  # 30 bits -> dist 30
        t[1, :2] = [(1 << 20) - 1, (1 << 20) - 1]  # 40 bits -> dist 40
        # 30 < 0.7 * 40 = 28 is false -> ratio test rejects
        idx, best, m = core.windowed_match(
            jnp.asarray(d), jnp.asarray(t), jnp.ones((1, 2), bool), 50, ratio=0.7)
        assert int(best[0]) == 30
        assert not bool(m[0])


class TestProjectionSearches:
    def _scene(self, n=50):
        X = rng.uniform([-3, -2, 4], [3, 2, 10], (n, 3)).astype(np.float32)
        R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        u = 500 * X[:, 0] / X[:, 2] + 320
        v = 500 * X[:, 1] / X[:, 2] + 240
        inb = (u > 20) & (u < W - 20) & (v > 20) & (v < H - 20)
        X, u, v = X[inb], u[inb], v[inb]
        return X, np.stack([u, v], -1), jnp.asarray(R), jnp.asarray(t)

    def test_search_local_points_exact(self):
        X, uv, R, t = self._scene()
        n = len(X)
        desc = random_desc(n)
        feats = feats_from(uv, desc)
        # reference convention: normal = (P - Ow)/|..| points camera -> point
        normals = X / np.linalg.norm(X, axis=-1, keepdims=True)
        d = np.linalg.norm(X, axis=-1)
        # dmax == dist so the predicted octave is 0, matching the features
        lm = LandmarkSet(
            jnp.asarray(X), jnp.asarray(normals), jnp.asarray(d * 0.5),
            jnp.asarray(d), jnp.asarray(desc), jnp.ones(n, bool))
        fr = search.frustum_check(CAM, R, t, lm, W, H)
        assert int(fr.visible.sum()) == n
        idx, dist, matched = search.search_local_points(CAM, R, t, lm, fr, feats, th=3.0)
        m = np.asarray(matched)
        assert m.sum() >= n - 1
        np.testing.assert_array_equal(np.asarray(idx)[m], np.arange(n)[m])
        assert np.all(np.asarray(dist)[m] == 0)

    def test_search_by_projection_frame(self):
        X, uv, R, t = self._scene()
        n = len(X)
        desc = random_desc(n)
        prev = feats_from(uv, desc)
        # current frame slightly shifted observations, same descriptors
        feats = feats_from(uv + rng.uniform(-2, 2, uv.shape), desc)
        idx, dist, matched = search.search_by_projection_frame(
            CAM, R, t, jnp.asarray(X), prev, jnp.ones(n, bool), feats,
            th=7.0, width=W, height=H, forward=False, backward=False)
        m = np.asarray(matched)
        assert m.sum() >= 0.9 * n
        np.testing.assert_array_equal(np.asarray(idx)[m], np.arange(n)[m])

    def test_fuse_chi2_gate(self):
        X, uv, R, t = self._scene()
        n = len(X)
        desc = random_desc(n)
        feats = feats_from(uv, desc)
        normals = X / np.linalg.norm(X, axis=-1, keepdims=True)
        d = np.linalg.norm(X, axis=-1)
        lm = LandmarkSet(jnp.asarray(X), jnp.asarray(normals), jnp.asarray(d * 0.5),
                         jnp.asarray(d), jnp.asarray(desc), jnp.ones(n, bool))
        idx, dist, matched = search.fuse_candidates(CAM, R, t, lm, feats, W, H)
        m = np.asarray(matched)
        assert m.sum() >= n - 1
        # Push landmarks far off: no fuse matches survive the chi2 gate
        lm_bad = lm._replace(pw=jnp.asarray(X + np.array([0.5, 0.5, 0], np.float32)))
        _, _, matched_bad = search.fuse_candidates(CAM, R, t, lm_bad, feats, W, H)
        assert int(matched_bad.sum()) < 0.2 * n


class TestInitAndEpipolar:
    def test_search_for_initialization(self):
        n = 80
        xy1 = rng.uniform([30, 30], [W - 30, H - 30], (n, 2)).astype(np.float32)
        desc = random_desc(n)
        f1 = feats_from(xy1, desc)
        shift = np.array([15.0, -8.0], np.float32)
        f2 = feats_from(xy1 + shift, desc)
        idx, dist, matched = search.search_for_initialization(f1, f2, f1.xy)
        m = np.asarray(matched)
        assert m.sum() >= 0.95 * n
        np.testing.assert_array_equal(np.asarray(idx)[m], np.arange(n)[m])

    def test_search_for_triangulation_epipolar_gate(self):
        # Two views with pure x translation: epipolar lines are horizontal.
        X = rng.uniform([-2, -2, 5], [2, 2, 10], (60, 3)).astype(np.float32)
        R2, t2 = np.eye(3, dtype=np.float32), np.array([-0.5, 0, 0], np.float32)
        u1 = 500 * X[:, 0] / X[:, 2] + 320
        v1 = 500 * X[:, 1] / X[:, 2] + 240
        Xc2 = X + t2
        u2 = 500 * Xc2[:, 0] / Xc2[:, 2] + 320
        v2 = 500 * Xc2[:, 1] / Xc2[:, 2] + 240
        desc = random_desc(60)
        f1 = feats_from(np.stack([u1, v1], -1), desc)
        f2 = feats_from(np.stack([u2, v2], -1), desc)
        # F12 = K^-T [t]x R K^-1 (1->2 with x2^T F x1 = 0); build directly
        K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        tx = np.array([[0, 0, 0], [0, 0, 0.5], [0, -0.5, 0]], np.float32)
        F = np.linalg.inv(K).T @ tx @ np.eye(3) @ np.linalg.inv(K)
        # our convention: l2 = F12^T x1 -> F12^T = F (x2^T F x1 = 0)
        F12 = F.T.astype(np.float32)
        e2 = np.array([1e6, 1e6], np.float32)  # epipole at infinity (pure x-translation)
        idx, dist, matched = search.search_for_triangulation(
            CAM, f1, f2, jnp.ones(60, bool), jnp.ones(60, bool),
            jnp.asarray(F12), jnp.asarray(e2))
        m = np.asarray(matched)
        assert m.sum() >= 0.9 * 60
        np.testing.assert_array_equal(np.asarray(idx)[m], np.arange(60)[m])
        # Corrupt geometry: points moved off the epipolar line don't match
        f2_bad = feats_from(np.stack([u2, v2 + 30], -1), desc)
        _, _, matched_bad = search.search_for_triangulation(
            CAM, f1, f2_bad, jnp.ones(60, bool), jnp.ones(60, bool),
            jnp.asarray(F12), jnp.asarray(e2))
        assert int(matched_bad.sum()) == 0
