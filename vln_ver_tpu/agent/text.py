"""Instruction encoder: a compact BERT-style transformer.

The paper initialises its text branch from a pretrained LXMERT/BERT stack
(as in DUET/HAMT).  Two architectures are supported:

* ``arch="preln"`` (default) — pre-LN transformer, trains stably from
  scratch; used by the synthetic-rehearsal tasks.
* ``arch="bert"`` — exact HuggingFace ``BertModel`` encoder layout
  (post-LN blocks, token-type embeddings, no final norm), so pretrained
  BERT weights convert function-preservingly via
  :func:`convert_hf_bert_params` (see ``tools/convert_text_encoder.py``).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class TextEncoder(nn.Module):
    vocab_size: int = 4000
    embed_dims: int = 768
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 1536
    max_len: int = 80
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    arch: str = "preln"  # "preln" | "bert"

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) int32; mask (B, L) bool (True = real token).
        Returns (B, L, C)."""
        assert self.arch in ("preln", "bert"), self.arch
        b, l = tokens.shape
        emb = nn.Embed(self.vocab_size, self.embed_dims,
                       dtype=self.dtype, name="token_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.embed_dims))
        x = emb + pos[None, :l].astype(self.dtype)
        if self.arch == "bert":
            # single-segment input: token-type embedding of segment 0
            type_embed = self.param("type_embed",
                                    nn.initializers.normal(0.02),
                                    (2, self.embed_dims))
            x = x + type_embed[0].astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="embed_norm")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        attn_mask = mask[:, None, None, :]  # (B, 1, 1, L)
        for i in range(self.num_layers):
            if self.arch == "preln":
                y = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
                y = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads, qkv_features=self.embed_dims,
                    dropout_rate=self.dropout_rate, dtype=self.dtype,
                    name=f"attn_{i}")(y, inputs_k=y, mask=attn_mask,
                                      deterministic=deterministic)
                x = x + y
                y = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
                y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                             name=f"fc1_{i}")(y)
                y = nn.gelu(y)
                y = nn.Dense(self.embed_dims, dtype=self.dtype,
                             name=f"fc2_{i}")(y)
                y = nn.Dropout(self.dropout_rate)(
                    y, deterministic=deterministic)
                x = x + y
            else:  # post-LN, HF BertLayer order
                y = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads, qkv_features=self.embed_dims,
                    dropout_rate=self.dropout_rate, dtype=self.dtype,
                    name=f"attn_{i}")(x, inputs_k=x, mask=attn_mask,
                                      deterministic=deterministic)
                y = nn.Dropout(self.dropout_rate)(
                    y, deterministic=deterministic)
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x + y)
                y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                             name=f"fc1_{i}")(x)
                y = nn.gelu(y, approximate=False)
                y = nn.Dense(self.embed_dims, dtype=self.dtype,
                             name=f"fc2_{i}")(y)
                y = nn.Dropout(self.dropout_rate)(
                    y, deterministic=deterministic)
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x + y)
        if self.arch == "preln":
            x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x


def convert_hf_bert_params(state_dict: Dict[str, "np.ndarray"],
                           num_layers: int, num_heads: int,
                           prefix: str = "") -> dict:
    """Map a HuggingFace ``BertModel`` torch state dict onto
    ``TextEncoder(arch="bert")`` flax params.

    ``state_dict`` values may be torch tensors or numpy arrays; keys may
    carry a ``prefix`` (e.g. ``"bert."``).  Returns the ``{"params": ...}``
    pytree.  The BERT pooler is intentionally dropped (the policy consumes
    token features, not the pooled CLS).
    """
    def get(name):
        v = state_dict[prefix + name]
        arr = np.asarray(v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v, np.float32)
        return arr

    hidden = get("embeddings.word_embeddings.weight").shape[1]
    assert hidden % num_heads == 0, (hidden, num_heads)
    hd = hidden // num_heads

    params = {
        "token_embed": {
            "embedding": get("embeddings.word_embeddings.weight")},
        "pos_embed": get("embeddings.position_embeddings.weight"),
        "type_embed": get("embeddings.token_type_embeddings.weight"),
        "embed_norm": {"scale": get("embeddings.LayerNorm.weight"),
                       "bias": get("embeddings.LayerNorm.bias")},
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}."
        attn = {}
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value")):
            w = get(pre + theirs + ".weight")       # (C, C) torch out-major
            bvec = get(pre + theirs + ".bias")
            attn[ours] = {"kernel": w.T.reshape(hidden, num_heads, hd),
                          "bias": bvec.reshape(num_heads, hd)}
        wo = get(pre + "attention.output.dense.weight")
        attn["out"] = {
            "kernel": wo.T.reshape(num_heads, hd, hidden),
            "bias": get(pre + "attention.output.dense.bias")}
        params[f"attn_{i}"] = attn
        params[f"ln1_{i}"] = {
            "scale": get(pre + "attention.output.LayerNorm.weight"),
            "bias": get(pre + "attention.output.LayerNorm.bias")}
        params[f"fc1_{i}"] = {
            "kernel": get(pre + "intermediate.dense.weight").T,
            "bias": get(pre + "intermediate.dense.bias")}
        params[f"fc2_{i}"] = {
            "kernel": get(pre + "output.dense.weight").T,
            "bias": get(pre + "output.dense.bias")}
        params[f"ln2_{i}"] = {
            "scale": get(pre + "output.LayerNorm.weight"),
            "bias": get(pre + "output.LayerNorm.bias")}
    return {"params": params}
