import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.config import CameraConfig
from ccm_slam_tpu.utils.camera import Camera


def euroc_cam():
    return Camera.from_config(CameraConfig())


class TestCamera:
    def test_project_backproject(self):
        cam = euroc_cam()
        uv = jnp.array([[100.0, 100.0], [367.215, 248.375], [700.0, 400.0]])
        pts = cam.backproject(uv, depth=jnp.array([2.0, 1.0, 5.0]))
        back = cam.project(pts)
        np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-4)

    def test_principal_point(self):
        cam = euroc_cam()
        uv = cam.project(jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(uv), [367.215, 248.375], atol=1e-5)

    def test_undistort_roundtrip(self):
        """distort(undistort(uv)) == uv for interior points."""
        cam = euroc_cam()
        key = jax.random.PRNGKey(0)
        uv = jax.random.uniform(key, (256, 2)) * jnp.array([500.0, 300.0]) + jnp.array(
            [120.0, 90.0]
        )
        und = cam.undistort_pixels(uv)
        norm = jnp.stack(
            [(und[..., 0] - cam.cx) / cam.fx, (und[..., 1] - cam.cy) / cam.fy], axis=-1
        )
        redist = cam.distort_normalized(norm)
        uv_back = jnp.stack(
            [redist[..., 0] * cam.fx + cam.cx, redist[..., 1] * cam.fy + cam.cy], axis=-1
        )
        np.testing.assert_allclose(np.asarray(uv_back), np.asarray(uv), atol=5e-2)

    def test_center_undistorts_to_itself(self):
        cam = euroc_cam()
        c = jnp.array([367.215, 248.375])
        np.testing.assert_allclose(np.asarray(cam.undistort_pixels(c)), np.asarray(c), atol=1e-3)

    def test_bounds_widen_for_barrel(self):
        """EuRoC has barrel distortion (k1<0): undistorted bounds extend past image."""
        cam = euroc_cam()
        b = np.asarray(cam.bounds)
        assert b[0] < 0 and b[1] > 752 and b[2] < 0 and b[3] > 480

    def test_in_bounds(self):
        cam = euroc_cam()
        assert bool(cam.in_bounds(jnp.array([100.0, 100.0])))
        assert not bool(cam.in_bounds(jnp.array([1e4, 100.0])))
