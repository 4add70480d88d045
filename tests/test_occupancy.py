import jax.numpy as jnp
import numpy as np

from vln_ver_tpu import occupancy


def test_sparse_dense_roundtrip_np():
    sparse = np.array([[3, 2], [10, 0], [77, 15]])
    dense = occupancy.dense_from_sparse_np(sparse, 100)
    assert dense[3] == 2 and dense[10] == 0 and dense[77] == 15
    assert (dense == 16).sum() == 97
    back = occupancy.sparse_from_dense_np(dense)
    np.testing.assert_array_equal(back, sparse)


def test_dense_from_sparse_jittable_with_padding():
    idx = jnp.asarray([3, 10, -1, -1])
    cls = jnp.asarray([2, 0, 7, 7])
    dense = np.asarray(occupancy.dense_from_sparse(idx, cls, 20))
    assert dense[3] == 2 and dense[10] == 0
    assert (dense == 16).sum() == 18


def test_decode_focal_threshold_rule():
    # logit 0 -> score 0.5 > 0.25 threshold -> occupied class argmax
    logits = jnp.asarray([[0.0, -10.0], [-10.0, -10.0]])
    cls = np.asarray(occupancy.decode_occupancy_focal(logits, 0.25))
    assert cls[0] == 0      # score .5 beats threshold
    assert cls[1] == 2      # all scores < threshold -> empty (=num_classes)


def test_decode_ce_argmax():
    logits = jnp.asarray([[0.1, 3.0, 0.2], [5.0, 0.0, 0.0]])
    cls = np.asarray(occupancy.decode_occupancy_ce(logits))
    np.testing.assert_array_equal(cls, [1, 0])
