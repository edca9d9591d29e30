import numpy as np
import jax.numpy as jnp
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu import camera as cam_mod


def _cornell_cam(res=(8, 8), pixel_offset=0.0):
    return pt.make_camera((278, 278, -500), (0, 0, 1), (0, 1, 0), res,
                          60 * pt.DEG2RAD, 1.0, pixel_offset=pixel_offset)


def test_camera_basis_orthonormal():
    cam = pt.make_camera((1.8, 1.8, 1.8), (-1, -1, -1), (0, 1, 0), (4, 4),
                         60 * pt.DEG2RAD, 1.0)
    f, u, r = map(np.asarray, (cam.forward, cam.up, cam.right))
    assert abs(np.linalg.norm(f) - 1) < 1e-6
    assert abs(np.linalg.norm(r) - 1) < 1e-6
    # right = forward x up (camera.h:37)
    np.testing.assert_allclose(
        r, np.cross(f, np.array([0, 1, 0.0])) /
        np.linalg.norm(np.cross(f, np.array([0, 1, 0.0]))), atol=1e-6)


def test_vres_matches_reference_formula():
    # camera.h:50-51: v_res = 2*d*tan(fov/2) * (1, res.y/res.x)
    cam = _cornell_cam(res=(16, 8))
    v = np.asarray(cam.v_res)
    vx = 2 * np.tan(60 * pt.DEG2RAD / 2)
    np.testing.assert_allclose(v, [vx, vx * 8 / 16], rtol=1e-6)


def test_degenerate_camera_raises():
    with pytest.raises(ValueError):
        pt.make_camera((0, 0, 0), (0, 1, 0), (0, 1, 0), (4, 4),
                       60 * pt.DEG2RAD, 1.0)


def test_center_ray_points_forward():
    # CPU convention (camera.h:64): offset 0, center pixel + jitter 0.5
    cam = _cornell_cam(res=(9, 9), pixel_offset=0.0)
    w = jnp.array([4], jnp.int32)
    h = jnp.array([4], jnp.int32)
    o, d = pt.get_rays(cam, w, h, jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(o)[0], [278, 278, -500], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-6)


def test_gpu_pixel_convention_shifts_half_cell():
    # GPU convention (shader.h:274-277): gl_FragCoord's +0.5 on top of the
    # jitter; the golden images bake this in, so it's the default.
    cam0 = _cornell_cam(res=(9, 9), pixel_offset=0.0)
    cam5 = _cornell_cam(res=(9, 9), pixel_offset=0.5)
    # 0.5 is make_camera's default (goldens are GPU renders)
    assert pt.make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), (4, 4),
                          1.0).pixel_offset == 0.5
    w = jnp.array([4], jnp.int32)
    h = jnp.array([4], jnp.int32)
    _, d0 = pt.get_rays(cam0, w, h, jnp.array([0.75]), jnp.array([0.25]))
    _, d5 = pt.get_rays(cam5, w, h, jnp.array([0.25]), jnp.array([-0.25]))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d5), atol=1e-6)


def test_corner_ray_direction_matches_manual_transform():
    cam = _cornell_cam(res=(8, 8), pixel_offset=0.0)
    w = jnp.array([0], jnp.int32)
    h = jnp.array([7], jnp.int32)
    u = jnp.array([0.25])
    v = jnp.array([0.75])
    o, d = pt.get_rays(cam, w, h, u, v)
    # manual: camera-space (x, y, -dist) rotated by basis
    cell = float(cam.cell_size)
    x = (0 + 0.25) * cell - float(cam.v_res[0]) / 2
    y = (7 + 0.75) * cell - float(cam.v_res[1]) / 2
    world = (x * np.asarray(cam.right) + y * np.asarray(cam.up)
             + 1.0 * np.asarray(cam.forward))
    world /= np.linalg.norm(world)
    np.testing.assert_allclose(np.asarray(d)[0], world, atol=1e-6)


def test_rotate_preserves_orthonormality():
    cam = _cornell_cam()
    for direction in (cam_mod.LEFT, cam_mod.RIGHT, cam_mod.UP, cam_mod.DOWN):
        c2 = pt.rotate(cam, direction, 5 * pt.DEG2RAD)
        f, u, r = map(np.asarray, (c2.forward, c2.up, c2.right))
        assert abs(np.dot(f, u)) < 1e-5
        assert abs(np.dot(f, r)) < 1e-5
        assert abs(np.linalg.norm(f) - 1) < 1e-5


def test_move_directions():
    cam = _cornell_cam()
    up = np.asarray(pt.move(cam, cam_mod.UP, 2.0).pos)
    np.testing.assert_allclose(up, [278, 280, -500], atol=1e-5)
    fwd = np.asarray(pt.move(cam, cam_mod.FORWARD, 3.0).pos)
    np.testing.assert_allclose(fwd, [278, 278, -497], atol=1e-5)
    left = np.asarray(pt.move(cam, cam_mod.LEFT, 1.0).pos)
    # right = forward x up = (0,0,1)x(0,1,0) = (-1,0,0); LEFT = pos - right
    np.testing.assert_allclose(left, [279, 278, -500], atol=1e-5)
