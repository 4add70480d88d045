import jax.numpy as jnp
import numpy as np

from vln_ver_tpu import boxes


def test_normalize_denormalize_roundtrip():
    rng = np.random.default_rng(1)
    n = 17
    g = np.zeros((n, 9), dtype=np.float32)
    g[:, :2] = rng.uniform(-6, 6, (n, 2))
    g[:, 2] = rng.uniform(-1.5, 2, n)
    g[:, 3:6] = rng.uniform(0.1, 3.0, (n, 3))
    g[:, 6] = rng.uniform(-np.pi, np.pi, n)
    norm = boxes.normalize_bbox(jnp.asarray(g))
    assert norm.shape == (n, 10)
    back = np.asarray(boxes.denormalize_bbox(norm))
    # exp(log(x)) in fp32 costs a few ulp
    np.testing.assert_allclose(back[:, :6], g[:, :6], rtol=1e-3, atol=1e-4)
    # yaw wraps through atan2(sin, cos)
    dyaw = np.angle(np.exp(1j * (back[:, 6] - g[:, 6])))
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)


def test_normalize_matches_reference_layout():
    # (cx, cy, log w, log l, cz, log h, sin, cos, vx, vy)
    g = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.5, 0.1, 0.2]])
    norm = np.asarray(boxes.normalize_bbox(g))
    np.testing.assert_allclose(
        norm[0],
        [1.0, 2.0, np.log(4.0), np.log(5.0), 3.0, np.log(6.0),
         np.sin(0.5), np.cos(0.5), 0.1, 0.2],
        rtol=1e-4)


def test_gravity_boxes_from_raw():
    raw = jnp.asarray([[1.0, 2.0, 0.0, 1.0, 1.0, 2.0, 0.3]])
    g = np.asarray(boxes.gravity_boxes_from_raw(raw))
    assert g.shape == (1, 9)
    np.testing.assert_allclose(g[0, 2], 1.0)  # z_bottom + h/2
    np.testing.assert_allclose(g[0, 7:], 0.0)
