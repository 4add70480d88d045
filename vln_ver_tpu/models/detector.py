"""VoxelFormer detector — the top-level model.

Reference: detectors/voxelformer.py:21-419.  The reference detector mixes
host I/O (HDF5 feature reads, occ-GT np.load) into the forward pass; here
the detector is a pure function of array inputs — all host I/O lives in
``vln_ver_tpu.data``.  The (inert) image backbone path of the reference is
dropped: the active contract is precomputed ViT-B/16 patch features
(voxelformer.py:282-289, SURVEY.md §0.2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .config import VERConfig
from .head import VoxelFormerOccupancyHead


class VoxelFormer(nn.Module):
    """Thin orchestration wrapper over the multi-task head.

    Inputs (one MP3D viewpoint per batch element):
      features:     (B, num_cams, feat_h, feat_w, in_channels) fp32/bf16
      world2pixel:  (B, num_cams, 4, 4) fp32
      origin_shift: (B, 3) fp32
    """
    cfg: VERConfig

    def setup(self):
        self.pts_bbox_head = VoxelFormerOccupancyHead(
            self.cfg, name="pts_bbox_head")

    def __call__(self, features: jnp.ndarray, world2pixel: jnp.ndarray,
                 origin_shift: jnp.ndarray, prev_bev=None, tsa_shift=None,
                 deterministic: bool = True, only_bev: bool = False):
        return self.pts_bbox_head(features, world2pixel, origin_shift,
                                  prev_bev=prev_bev, tsa_shift=tsa_shift,
                                  deterministic=deterministic,
                                  only_bev=only_bev)

    def obtain_history_bev(self, features_queue, world2pixel_queue,
                           origin_shift_queue):
        """Roll the encoder over a frame queue to produce the history BEV
        (reference obtain_history_bev, voxelformer.py:209-228): each frame's
        voxel grid is computed with the previous frame's grid in the TSA
        queue, under stop_gradient.

        Args: queues shaped (B, T, ...) — returns the final (B, bev_num, C).
        """
        import jax

        t_len = features_queue.shape[1]
        prev = None
        cfg = self.cfg
        import jax.numpy as jnp
        extent = jnp.asarray(cfg.pc_range[3:], jnp.float32) - jnp.asarray(
            cfg.pc_range[:3], jnp.float32)
        for t in range(t_len):
            # ego displacement in NORMALISED grid units: a world point at
            # normalised r in frame t sits at r + (origin_t -
            # origin_{t-1})/extent in the previous frame's grid — the
            # TSA slot-0 shift (temporal.py shift semantics)
            shift = (None if prev is None else
                     (origin_shift_queue[:, t]
                      - origin_shift_queue[:, t - 1]) / extent)
            prev = jax.lax.stop_gradient(self.pts_bbox_head(
                features_queue[:, t], world2pixel_queue[:, t],
                origin_shift_queue[:, t], prev_bev=prev, tsa_shift=shift,
                deterministic=True, only_bev=True)["bev_embed"])
        return prev
