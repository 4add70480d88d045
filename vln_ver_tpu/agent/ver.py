"""VER volume tokenizer + volume state estimation.

The policy consumes the VER voxel grid (bev_z*bev_h*bev_w x C, the artifact
dumped by tools/get_occ.py) rather than raw views — the paper's core claim.
Two pieces:

* ``VERTokenizer`` — compresses the 900-voxel volume into a small token set
  for cross-attention: per-z-slice mean tokens + learned-query pooling.
* ``VolumeStateHead`` — "volume state estimation" (paper §3.4): predicts the
  agent's relative state (heading sin/cos + position offset) from the
  volume; trained as an auxiliary task, used to ground the volume in the
  episodic frame.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class VERTokenizer(nn.Module):
    embed_dims: int = 768
    bev_z: int = 4
    bev_h: int = 15
    bev_w: int = 15
    num_query_tokens: int = 8
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, volume: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """volume (B, bev_z*bev_h*bev_w, C) -> tokens
        (B, bev_z + num_query_tokens, C)."""
        b = volume.shape[0]
        vol = volume.reshape(b, self.bev_z, self.bev_h * self.bev_w,
                             self.embed_dims)
        slice_tokens = jnp.mean(vol, axis=2)            # (B, Z, C)

        queries = self.param("pool_queries",
                             nn.initializers.normal(0.02),
                             (self.num_query_tokens, self.embed_dims))
        q = jnp.broadcast_to(queries[None],
                             (b,) + queries.shape).astype(self.dtype)
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=8, qkv_features=self.embed_dims, dtype=self.dtype,
            dropout_rate=self.dropout_rate, name="pool_attn")(
                q, inputs_k=volume.astype(self.dtype),
                deterministic=deterministic)
        tokens = jnp.concatenate([slice_tokens.astype(self.dtype), pooled],
                                 axis=1)
        return nn.LayerNorm(dtype=self.dtype, name="token_norm")(tokens)


class VolumeStateHead(nn.Module):
    """Predicts (sin h, cos h, dx, dy, dz) of the agent state from the
    pooled volume tokens (auxiliary volume-state-estimation loss)."""
    embed_dims: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(tokens, axis=1)
        x = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(5, dtype=jnp.float32, name="out")(x)
