import jax.numpy as jnp
import numpy as np

from vln_ver_tpu import geometry


def test_voxel_reference_points_ordering():
    ref = np.asarray(geometry.voxel_reference_points(4, 15, 15))
    assert ref.shape == (900, 3)
    # flat index = z*H*W + y*W + x; first entry is voxel (0,0,0) centre
    np.testing.assert_allclose(ref[0], [0.5 / 15, 0.5 / 15, 0.5 / 4])
    # x (w) is fastest
    np.testing.assert_allclose(ref[1], [1.5 / 15, 0.5 / 15, 0.5 / 4])
    # then y (h)
    np.testing.assert_allclose(ref[15], [0.5 / 15, 1.5 / 15, 0.5 / 4])
    # then z
    np.testing.assert_allclose(ref[225], [0.5 / 15, 0.5 / 15, 1.5 / 4])
    assert (ref > 0).all() and (ref < 1).all()


def test_projection_identity_camera():
    # A camera at the origin looking along +y with 90deg FoV: a world point at
    # (0, 1, 0) must project to the image centre.
    w2p = geometry.make_pinhole_world2pixel(90.0, 0.0, (0.0, 0.0, 0.0))
    pt_world = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    pc = geometry.PC_RANGE
    ref = (pt_world - np.array(pc[:3])) / (
        np.array(pc[3:]) - np.array(pc[:3]))
    xy, mask = geometry.project_reference_points(
        jnp.asarray(ref[None]), jnp.asarray(w2p[None]),
        jnp.zeros(3))
    assert bool(mask[0, 0])
    np.testing.assert_allclose(np.asarray(xy[0, 0]), [0.5, 0.5], atol=1e-6)


def test_projection_behind_camera_masked():
    w2p = geometry.make_pinhole_world2pixel(90.0, 0.0, (0.0, 0.0, 0.0))
    pt_world = np.array([0.0, -1.0, 0.0], dtype=np.float32)  # behind
    pc = geometry.PC_RANGE
    ref = (pt_world - np.array(pc[:3])) / (
        np.array(pc[3:]) - np.array(pc[:3]))
    xy, mask = geometry.project_reference_points(
        jnp.asarray(ref[None]), jnp.asarray(w2p[None]), jnp.zeros(3))
    assert not bool(mask[0, 0])
    assert np.isfinite(np.asarray(xy)).all()


def test_projection_matches_manual_matrix_math():
    rng = np.random.default_rng(0)
    ref = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    mats = np.stack([
        geometry.make_pinhole_world2pixel(90.0, 60.0 * i, (0.1, -0.2, 0.3))
        for i in range(6)
    ])
    shift = np.array([0.5, -0.25, 0.1], dtype=np.float32)
    xy, mask = geometry.project_reference_points(
        jnp.asarray(ref), jnp.asarray(mats), jnp.asarray(shift))
    # fp32 end-to-end: the function (like the reference's force_fp32
    # point_sampling) computes in fp32, so the oracle must too.
    pc = np.asarray(geometry.PC_RANGE, dtype=np.float32)
    world = (ref * (pc[3:] - pc[:3]) + pc[:3] + shift).astype(np.float32)
    homo = np.concatenate([world, np.ones((64, 1), np.float32)], -1)
    for c in range(6):
        proj = (homo @ mats[c].T.astype(np.float32)).astype(np.float32)
        depth = proj[:, 2]
        exp_xy = proj[:, :2] / np.maximum(depth, 1e-5)[:, None]
        exp_xy = exp_xy / np.array(geometry.IMAGE_WH)
        exp_mask = ((depth > 1e-5) & (exp_xy[:, 0] > 0) & (exp_xy[:, 0] < 1)
                    & (exp_xy[:, 1] > 0) & (exp_xy[:, 1] < 1))
        np.testing.assert_array_equal(np.asarray(mask[c]), exp_mask)
        # x/z is ill-conditioned in fp32 for near-zero depth (by design,
        # matching the reference's fp32 point_sampling); compare where the
        # projection is numerically meaningful.
        stable = exp_mask & (depth > 0.2)
        got = np.asarray(xy[c])[stable]
        np.testing.assert_allclose(got, exp_xy[stable], rtol=1e-3,
                                   atol=1e-4)
    # every visible-from-some-camera query should exist in a sane setup
    assert np.asarray(mask).any()
