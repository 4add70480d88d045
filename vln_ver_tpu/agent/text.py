"""Instruction encoder: a compact BERT-style transformer.

The paper initialises its text branch from a pretrained LXMERT/BERT stack
(as in DUET/HAMT); architecture here matches that shape (learned token +
position embeddings, pre-LN transformer, padding mask) so pretrained
weights can be converted in later; training from scratch works for the
synthetic tasks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TextEncoder(nn.Module):
    vocab_size: int = 4000
    embed_dims: int = 768
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 1536
    max_len: int = 80
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) int32; mask (B, L) bool (True = real token).
        Returns (B, L, C)."""
        b, l = tokens.shape
        emb = nn.Embed(self.vocab_size, self.embed_dims,
                       dtype=self.dtype, name="token_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.embed_dims))
        x = emb + pos[None, :l].astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="embed_norm")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        attn_mask = mask[:, None, None, :]  # (B, 1, 1, L)
        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dims,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name=f"attn_{i}")(y, y, y, mask=attn_mask,
                                  deterministic=deterministic)
            x = x + y
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                         name=f"fc1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name=f"fc2_{i}")(y)
            y = nn.Dropout(self.dropout_rate)(y,
                                              deterministic=deterministic)
            x = x + y
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
