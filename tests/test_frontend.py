import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.ops import fast, hamming, image, orientation, brief
from orb_slam2_with_comment_tpu.frontend import OrbExtractor

rng = np.random.RandomState(3)


def synth_image(h=240, w=320, n_dots=60, seed=0):
    """Random blobs on a gradient background — plenty of FAST corners."""
    r = np.random.RandomState(seed)
    img = np.tile(np.linspace(40, 80, w, dtype=np.float32), (h, 1))
    for _ in range(n_dots):
        y, x = r.randint(20, h - 20), r.randint(20, w - 20)
        s = r.randint(2, 6)
        img[y - s:y + s, x - s:x + s] = r.choice([200.0, 10.0])
    return img


class TestFast:
    def test_uniform_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        s = fast.fast_score_map(img)
        assert float(jnp.max(s)) == 0.0

    def test_bright_dot_detected(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[32, 32] = 200.0
        s = np.asarray(fast.fast_score_map(jnp.asarray(img)))
        assert s[32, 32] > 100.0  # isolated dot is a max-contrast corner

    def test_score_matches_contrast(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[30:34, 30:34] = 115.0  # corner contrast 15: weak corner
        s = np.asarray(fast.fast_score_map(jnp.asarray(img)))
        m = s.max()
        assert 7.0 < m <= 20.0  # detected only via low-threshold fallback

    def test_against_opencv(self):
        import cv2
        img = synth_image()
        u8 = img.astype(np.uint8)
        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        kps_cv = det.detect(u8, None)
        cv_set = {(int(k.pt[1]), int(k.pt[0])) for k in kps_cv}
        s = np.asarray(fast.nms3x3(fast.fast_score_map(jnp.asarray(u8.astype(np.float32)))))
        ours = {(y, x) for y, x in zip(*np.where(s > 20.0))}
        # Allow 1px slack for NMS tie-breaks.
        def near(p, S):
            return any((p[0] + dy, p[1] + dx) in S for dy in (-1, 0, 1) for dx in (-1, 0, 1))
        recall = sum(near(p, ours) for p in cv_set) / max(len(cv_set), 1)
        precision = sum(near(p, cv_set) for p in ours) / max(len(ours), 1)
        assert recall > 0.8, (recall, len(cv_set), len(ours))
        assert precision > 0.8, (precision, len(cv_set), len(ours))

    def test_select_keypoints_budget_and_margin(self):
        img = jnp.asarray(synth_image())
        s = fast.fast_score_map(img)
        yx, resp, valid = fast.select_keypoints(s, 100)
        assert yx.shape == (100, 2)
        assert int(valid.sum()) > 10
        v = np.asarray(valid)
        assert np.all(np.asarray(resp)[v] > 7.0)


class TestOrientation:
    def test_gradient_angle(self):
        # Intensity increasing with +x => centroid to the right => angle ~ 0
        img = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (64, 1))
        ang = orientation.angles_at(jnp.asarray(img), jnp.asarray([[32, 32]]))
        assert abs(float(ang[0])) < 0.1
        # +y gradient => angle ~ pi/2
        ang2 = orientation.angles_at(jnp.asarray(img.T.copy()), jnp.asarray([[32, 32]]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.1

    def test_rotation_consistency(self):
        import cv2
        img = synth_image(128, 128, 25, seed=5)
        M = cv2.getRotationMatrix2D((64, 64), 30.0, 1.0)
        rot = cv2.warpAffine(img, M, (128, 128))
        a0 = float(orientation.angles_at(jnp.asarray(img), jnp.asarray([[64, 64]]))[0])
        a1 = float(orientation.angles_at(jnp.asarray(rot), jnp.asarray([[64, 64]]))[0])
        # image rotated by -30deg in pixel coords (y down): angle shifts by +-30
        diff = (a1 - a0 + np.deg2rad(30)) % (2 * np.pi)
        diff = min(diff, 2 * np.pi - diff)
        assert diff < 0.12


class TestBrief:
    def test_descriptor_determinism_and_contrast(self):
        img = jnp.asarray(synth_image(128, 128, seed=2))
        blurred = image.gaussian_blur(img)
        yx = jnp.asarray([[40, 40], [80, 80]])
        ang = jnp.zeros(2)
        d1 = brief.descriptors(blurred, yx, ang)
        d2 = brief.descriptors(blurred, yx, ang)
        assert np.array_equal(np.asarray(d1), np.asarray(d2))
        # different locations -> distant descriptors
        dist = int(hamming.hamming_pair(d1[0], d1[1]))
        assert dist > 40

    def test_rotation_invariance(self):
        import cv2
        img = synth_image(160, 160, 40, seed=7)
        blurred0 = image.gaussian_blur(jnp.asarray(img))
        M = cv2.getRotationMatrix2D((80, 80), 45.0, 1.0)
        rot = cv2.warpAffine(img, M, (160, 160))
        blurred1 = image.gaussian_blur(jnp.asarray(rot))
        kp = jnp.asarray([[80, 80]])
        a0 = orientation.angles_at(jnp.asarray(img), kp)
        a1 = orientation.angles_at(jnp.asarray(rot), kp)
        d0 = brief.descriptors(blurred0, kp, a0)
        d1 = brief.descriptors(blurred1, kp, a1)
        dist = int(hamming.hamming_pair(d0[0], d1[0]))
        assert dist < 60, dist  # oriented sampling keeps the descriptor stable


class TestHamming:
    def test_known_distances(self):
        a = jnp.zeros((1, 8), jnp.uint32)
        b = jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)
        assert int(hamming.distance_matrix(a, b)[0, 0]) == 256
        assert int(hamming.distance_matrix(a, a)[0, 0]) == 0
        c = jnp.asarray([[1, 0, 0, 0, 0, 0, 0, 3]], jnp.uint32)
        assert int(hamming.distance_matrix(a, c)[0, 0]) == 3

    def test_best_two(self):
        d = jnp.asarray([[5, 2, 9, 2]], jnp.int32)
        best, idx, second = hamming.best_two(d)
        assert int(best[0]) == 2 and int(second[0]) == 2
        valid = jnp.asarray([[True, False, True, False]])
        best, idx, second = hamming.best_two(d, valid)
        assert int(best[0]) == 5 and int(idx[0]) == 0 and int(second[0]) == 9


class TestExtractor:
    def test_end_to_end(self):
        ext = OrbExtractor(n_features=500)
        feats = ext(jnp.asarray(synth_image(240, 320)))
        assert feats.xy.shape == (500, 2)
        n_valid = int(feats.valid.sum())
        assert n_valid > 100, n_valid
        v = np.asarray(feats.valid)
        oct_ = np.asarray(feats.octave)[v]
        assert oct_.min() >= 0 and oct_.max() < 8
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
        # descriptors of valid keypoints are mostly distinct
        d = np.asarray(feats.desc)[v]
        assert len(np.unique(d, axis=0)) > 0.8 * len(d)

    def test_budgets_sum(self):
        from orb_slam2_with_comment_tpu.frontend.extractor import level_budgets
        assert sum(level_budgets(1000)) == 1000
        assert sum(level_budgets(2000)) == 2000
