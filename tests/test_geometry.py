"""Unit tests for the SE3/Sim3/camera substrate (SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_2021_tpu.geometry import (
    so3_exp, so3_log, quat_to_rot, rot_to_quat,
    se3_exp, se3_log, se3_compose, se3_inverse, se3_apply, se3_identity,
    mat44, from_mat44,
    sim3_exp, sim3_log, sim3_compose, sim3_inverse, sim3_apply, sim3_identity,
)
from orb_slam2_2021_tpu.geometry.camera import (
    PinholeCamera, project_stereo, project_mono, backproject,
)


def random_rotvecs(rng, n, scale=2.0):
    return jnp.asarray(rng.standard_normal((n, 3)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_orthonormal(self, rng):
        w = random_rotvecs(rng, 64)
        R = so3_exp(w)
        eye = jnp.eye(3)
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
        assert err < 1e-5
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        # |w| < pi: log is the exact inverse
        w = random_rotvecs(rng, 128, scale=1.0)
        norm = np.linalg.norm(np.asarray(w), axis=-1, keepdims=True)
        w = jnp.asarray(np.asarray(w) * np.minimum(1.0, 3.0 / (norm + 1e-9)), jnp.float32)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=5e-4)

    def test_exp_log_exp_consistent(self, rng):
        # beyond pi the log wraps; exp(log(R)) must still equal R
        w = random_rotvecs(rng, 128, scale=3.0)
        R = so3_exp(w)
        R2 = so3_exp(so3_log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.isfinite(np.asarray(so3_log(R))).all()

    def test_known_rotation(self):
        # 90 deg about z
        w = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
        R = so3_exp(w)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)

    def test_quat_roundtrip(self, rng):
        w = random_rotvecs(rng, 128)
        R = so3_exp(w)
        q = rot_to_quat(R)
        R2 = quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_quat_near_pi(self):
        w = jnp.array([[np.pi - 1e-4, 0.0, 0.0], [0.0, np.pi - 1e-4, 0.0]], dtype=jnp.float32)
        R = so3_exp(w)
        q = rot_to_quat(R)
        R2 = quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.asarray(rng.standard_normal((64, 6)), dtype=np.float32)
        # keep the rotation part below pi so log is the exact inverse
        wn = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 3.0 / (wn + 1e-9))
        xi = jnp.asarray(xi)
        R, t = se3_exp(xi)
        xi2 = se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.standard_normal((32, 6)), dtype=jnp.float32)
        R, t = se3_exp(xi)
        Ri, ti = se3_inverse(R, t)
        Rc, tc = se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply_matches_mat44(self, rng):
        xi = jnp.asarray(rng.standard_normal((8, 6)), dtype=jnp.float32)
        R, t = se3_exp(xi)
        x = jnp.asarray(rng.standard_normal((8, 3)), dtype=jnp.float32)
        y = se3_apply(R, t, x)
        T = mat44(R, t)
        xh = jnp.concatenate([x, jnp.ones((8, 1))], axis=-1)
        y2 = jnp.einsum("nij,nj->ni", T, xh)[..., :3]
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-5)
        R3, t3 = from_mat44(T)
        np.testing.assert_allclose(np.asarray(R3), np.asarray(R))

    def test_identity(self):
        R, t = se3_identity((5,))
        assert R.shape == (5, 3, 3) and t.shape == (5, 3)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.asarray(rng.standard_normal((64, 7)) * 0.8, dtype=np.float32)
        wn = np.linalg.norm(xi[:, 3:6], axis=-1, keepdims=True)
        xi[:, 3:6] *= np.minimum(1.0, 2.8 / (wn + 1e-9))
        xi = jnp.asarray(xi)
        s, R, t = sim3_exp(xi)
        xi2 = sim3_log(s, R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.standard_normal((16, 7)) * 0.5, dtype=jnp.float32)
        s, R, t = sim3_exp(xi)
        si, Ri, ti = sim3_inverse(s, R, t)
        sc, Rc, tc = sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-4)

    def test_scale_acts(self):
        s, R, t = sim3_identity()
        s = s * 2.0
        x = jnp.array([1.0, 2.0, 3.0])
        y = sim3_apply(s, R, t, x)
        np.testing.assert_allclose(np.asarray(y), [2.0, 4.0, 6.0], atol=1e-6)

    def test_zero_is_identity(self):
        s, R, t = sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


class TestCamera:
    def test_project_backproject(self, rng):
        cam = PinholeCamera.create(400.0, 410.0, 320.0, 240.0, bf=40.0)
        z = jnp.asarray(rng.uniform(0.5, 30.0, (100,)), dtype=jnp.float32)
        uv = jnp.asarray(rng.uniform(0, 640, (100, 2)), dtype=jnp.float32)
        xc = backproject(cam, uv, z)
        uv2, z2 = project_mono(cam, xc)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)

    def test_stereo_disparity(self):
        cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, bf=40.0)
        xc = jnp.array([[0.0, 0.0, 10.0]])
        uvr, z = project_stereo(cam, xc)
        # u_r = u - bf/z = 320 - 4
        np.testing.assert_allclose(np.asarray(uvr[0]), [320.0, 240.0, 316.0], atol=1e-4)

    def test_jit_through(self):
        cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, bf=40.0)
        f = jax.jit(lambda c, x: project_stereo(c, x)[0])
        out = f(cam, jnp.ones((4, 3)))
        assert out.shape == (4, 3)
