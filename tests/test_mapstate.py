import numpy as np
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.mapstate.map import (
    MapConfig, add_observation, empty_map, landmark_obs_count,
    merge_landmarks, rebuild_observations, covisibility_weights,
)


def small_map():
    m = empty_map(MapConfig(k_max=4, n_feat=8, l_max=16, d_max=4))
    m = m._replace(
        kf_valid=m.kf_valid.at[:3].set(True),
        kf_feat_valid=m.kf_feat_valid.at[:3].set(True),
        lm_valid=m.lm_valid.at[:6].set(True),
        n_kf=jnp.int32(3), n_lm=jnp.int32(6),
    )
    return m


class TestObservations:
    def test_add_and_count(self):
        m = small_map()
        m = add_observation(m, jnp.asarray([0, 1, 0]), jnp.asarray([0, 0, 1]),
                            jnp.asarray([2, 3, 4]), jnp.asarray([True, True, True]))
        nobs = np.asarray(landmark_obs_count(m))
        assert nobs[0] == 2 and nobs[1] == 1
        assert int(m.kf_lm[0, 2]) == 0
        assert int(m.kf_lm[1, 4]) == 0

    def test_rebuild_consistency(self):
        m = small_map()
        m = add_observation(m, jnp.asarray([0, 1, 0, 2]), jnp.asarray([0, 0, 1, 2]),
                            jnp.asarray([2, 3, 4, 5]), jnp.ones(4, bool))
        m2 = rebuild_observations(m)
        np.testing.assert_array_equal(
            np.asarray(landmark_obs_count(m)), np.asarray(landmark_obs_count(m2)))
        # slot 0 = earliest keyframe
        assert int(m2.lm_obs_kf[0, 0]) == 0
        assert int(m2.lm_obs_kf[0, 1]) == 1

    def test_merge(self):
        m = small_map()
        # lm0 seen by kf0/f2, kf1/f4; lm1 seen by kf2/f3
        m = add_observation(m, jnp.asarray([0, 0, 1]), jnp.asarray([0, 1, 2]),
                            jnp.asarray([2, 4, 3]), jnp.ones(3, bool))
        m2 = merge_landmarks(m, jnp.asarray([0]), jnp.asarray([1]),
                             jnp.asarray([True]))
        assert not bool(m2.lm_valid[1])
        assert bool(m2.lm_valid[0])
        # kf2's backref now points at lm0, and lm0 has 3 observations
        assert int(m2.kf_lm[2, 3]) == 0
        assert int(landmark_obs_count(m2)[0]) == 3
        assert int(landmark_obs_count(m2)[1]) == 0

    def test_covisibility(self):
        m = small_map()
        # lm0 and lm1 both seen by kf0 and kf1 -> weight 2
        m = add_observation(m, jnp.asarray([0, 0, 1, 1]), jnp.asarray([0, 1, 0, 1]),
                            jnp.asarray([0, 0, 1, 1]), jnp.ones(4, bool))
        w = np.asarray(covisibility_weights(m, jnp.int32(0)))
        assert w[1] == 2 and w[0] == 0


class TestCompaction:
    def test_compact_landmarks(self):
        from orb_slam2_with_comment_tpu.mapstate.map import compact_landmarks
        m = small_map()
        # observations: lm0 @ (kf0,f2), lm2 @ (kf1,f4), lm5 @ (kf2,f3)
        m = add_observation(m, jnp.asarray([0, 2, 5]), jnp.asarray([0, 1, 2]),
                            jnp.asarray([2, 4, 3]), jnp.ones(3, bool))
        # kill lm1, lm3, lm4 -> live rows must pack to slots 0..2 in order
        m = m._replace(lm_valid=m.lm_valid.at[jnp.asarray([1, 3, 4])].set(False),
                       lm_pw=m.lm_pw.at[0].set(jnp.asarray([1., 0, 0]))
                       .at[2].set(jnp.asarray([2., 0, 0]))
                       .at[5].set(jnp.asarray([3., 0, 0])))
        m2 = compact_landmarks(m)
        assert int(m2.n_lm) == 3
        assert bool(m2.lm_valid[:3].all()) and not bool(m2.lm_valid[3:].any())
        np.testing.assert_allclose(np.asarray(m2.lm_pw[:3, 0]), [1.0, 2.0, 3.0])
        # keyframe back-references remapped
        assert int(m2.kf_lm[0, 2]) == 0
        assert int(m2.kf_lm[1, 4]) == 1
        assert int(m2.kf_lm[2, 3]) == 2
        # observation rows moved with the landmarks
        assert int(m2.lm_obs_kf[1, 0]) == 1
        assert int(m2.lm_obs_feat[1, 0]) == 4
        nobs = np.asarray(landmark_obs_count(m2))
        assert nobs[:3].tolist() == [1, 1, 1] and nobs[3:].sum() == 0
