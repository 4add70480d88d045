"""Dual-scale cross-modal VLN policy over VER volumes.

Designed from the paper (arXiv 2403.14158) + its DUET lineage: a *local*
branch grounds the instruction in the current viewpoint's VER volume
(fine-grained 3D context + volume state estimation), a *global* branch
scores the episodic-memory nodes (topological map) for the next action; the
action space is {stop} ∪ {memory nodes}, masked by validity — DUET's
global action space.

All shapes static; one policy step jits once and is scanned over rollout
steps.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .memory import EpisodicMemory
from .text import TextEncoder
from .ver import VERTokenizer, VolumeStateHead


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    embed_dims: int = 768
    num_heads: int = 8
    fusion_layers: int = 4
    text_layers: int = 4
    ffn_dim: int = 1536
    vocab_size: int = 4000
    max_text_len: int = 80
    max_nodes: int = 32
    bev_z: int = 4
    bev_h: int = 15
    bev_w: int = 15
    num_query_tokens: int = 8
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # "preln" trains from scratch; "bert" matches HF BertModel layout so
    # pretrained weights drop in (tools/convert_text_encoder.py)
    text_arch: str = "preln"
    # text branch may need a different FFN width than the fusion blocks
    # (e.g. BERT-base uses 3072); None = same as ffn_dim
    text_ffn_dim: Optional[int] = None
    # fusion-block architecture: "preln" (self->cross->ffn, pre-LN, trains
    # from scratch) or "bert" — the exact LXMERT/DUET cross-modal x-layer
    # (cross->self->ffn, post-LN) so pretrained DUET/HAMT cross-modal
    # weights drop in function-preservingly (tools/convert_crossmodal.py)
    fusion_arch: str = "preln"


class PolicyOutput(NamedTuple):
    logits: jnp.ndarray       # (B, 1 + max_nodes): [stop, nodes...]
    state_pred: jnp.ndarray   # (B, 5) volume state estimation
    text_feats: jnp.ndarray   # (B, L, C) (reusable across steps)
    # REVERIE object grounding scores (B, max_objects); None when the
    # step was called without candidate objects
    obj_logits: Optional[jnp.ndarray] = None


class _FusionBlock(nn.Module):
    cfg: PolicyConfig

    @nn.compact
    def __call__(self, x, x_mask, text, text_mask, deterministic=True):
        cfg = self.cfg
        sa_mask = (x_mask[:, None, None, :]
                   & x_mask[:, None, :, None])
        if cfg.fusion_arch == "bert":
            # LXMERT/DUET x-layer, vision stream (DUET vilmodel
            # LXRTXLayer): cross-attention -> self-attention -> FFN with
            # post-LN residuals, exact HF Bert sublayer layout so
            # pretrained cross-modal weights convert function-preservingly
            ca_mask = text_mask[:, None, None, :]
            y = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
                dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
                name="cross_attn")(x, inputs_k=text, mask=ca_mask,
                                   deterministic=deterministic)
            y = nn.Dropout(cfg.dropout_rate)(y, deterministic=deterministic)
            x = nn.LayerNorm(dtype=cfg.dtype, name="ln_ca")(x + y)
            y = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
                dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
                name="self_attn")(x, inputs_k=x, mask=sa_mask,
                                  deterministic=deterministic)
            y = nn.Dropout(cfg.dropout_rate)(y, deterministic=deterministic)
            x = nn.LayerNorm(dtype=cfg.dtype, name="ln_sa")(x + y)
            y = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="fc1")(x)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.embed_dims, dtype=cfg.dtype, name="fc2")(y)
            y = nn.Dropout(cfg.dropout_rate)(y, deterministic=deterministic)
            return nn.LayerNorm(dtype=cfg.dtype, name="ln_ffn")(x + y)
        y = nn.LayerNorm(dtype=cfg.dtype, name="ln_sa")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="self_attn")(y, inputs_k=y, mask=sa_mask,
                              deterministic=deterministic)
        x = x + y
        ca_mask = text_mask[:, None, None, :]
        y = nn.LayerNorm(dtype=cfg.dtype, name="ln_ca")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="cross_attn")(y, inputs_k=text, mask=ca_mask,
                               deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=cfg.dtype, name="ln_ffn")(x)
        y = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(cfg.embed_dims, dtype=cfg.dtype, name="fc2")(y)
        y = nn.Dropout(cfg.dropout_rate)(y, deterministic=deterministic)
        return x + y


class VLNPolicy(nn.Module):
    cfg: PolicyConfig

    def setup(self):
        cfg = self.cfg
        self.text_encoder = TextEncoder(
            vocab_size=cfg.vocab_size, embed_dims=cfg.embed_dims,
            num_layers=cfg.text_layers, num_heads=cfg.num_heads,
            ffn_dim=cfg.text_ffn_dim or cfg.ffn_dim,
            max_len=cfg.max_text_len,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            arch=cfg.text_arch, name="text_encoder")
        self.ver_tokenizer = VERTokenizer(
            embed_dims=cfg.embed_dims, bev_z=cfg.bev_z, bev_h=cfg.bev_h,
            bev_w=cfg.bev_w, num_query_tokens=cfg.num_query_tokens,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="ver_tokenizer")
        self.state_head = VolumeStateHead(cfg.embed_dims,
                                          dtype=cfg.dtype,
                                          name="volume_state_head")
        self.local_blocks = [
            _FusionBlock(cfg, name=f"local_block_{i}")
            for i in range(cfg.fusion_layers)
        ]
        self.global_blocks = [
            _FusionBlock(cfg, name=f"global_block_{i}")
            for i in range(cfg.fusion_layers)
        ]
        self.stop_token = self.param("stop_token",
                                     nn.initializers.normal(0.02),
                                     (cfg.embed_dims,))
        self.visited_embed = self.param("visited_embed",
                                        nn.initializers.normal(0.02),
                                        (2, cfg.embed_dims))
        self.pos_mlp = nn.Dense(cfg.embed_dims, dtype=cfg.dtype,
                                name="pos_mlp")
        self.local_ctx_proj = nn.Dense(cfg.embed_dims, dtype=cfg.dtype,
                                       name="local_ctx_proj")
        self.score_head = nn.Dense(1, dtype=jnp.float32, name="score_head")
        self.fuse_gate = nn.Dense(1, dtype=jnp.float32, name="fuse_gate")
        # REVERIE grounding: instruction-conditioned local context scores
        # candidate objects at the stop viewpoint (RGS metric)
        self.ground_proj = nn.Dense(cfg.embed_dims, dtype=cfg.dtype,
                                    name="ground_proj")

    def encode_text(self, tokens, text_mask, deterministic: bool = True):
        return self.text_encoder(tokens, text_mask,
                                 deterministic=deterministic)

    def tokenize_volume(self, volume, deterministic: bool = True):
        """VER volume -> (B, T, C) tokens (text-independent, so pretrain
        callers that fuse the same volume against several text variants
        compute it once and pass it back via ``vol_tokens``)."""
        return self.ver_tokenizer(volume, deterministic=deterministic)

    def local_fusion(self, tokens, text_mask, volume,
                     text_feats: Optional[jnp.ndarray] = None,
                     vol_tokens: Optional[jnp.ndarray] = None,
                     deterministic: bool = True):
        """Shared local-branch computation (also driven standalone by the
        pretraining proxy tasks, agent/pretrain.py): instruction-grounded
        VER volume tokens.

        Returns (x_loc (B, T, C) fused volume tokens, text_feats (B, L, C),
        state_pred (B, 5))."""
        if text_feats is None:
            text_feats = self.encode_text(tokens, text_mask,
                                          deterministic=deterministic)
        local_tokens = (vol_tokens if vol_tokens is not None
                        else self.ver_tokenizer(
                            volume, deterministic=deterministic))
        state_pred = self.state_head(local_tokens)
        lmask = jnp.ones(local_tokens.shape[:2], bool)
        x_loc = local_tokens
        for blk in self.local_blocks:
            x_loc = blk(x_loc, lmask, text_feats, text_mask,
                        deterministic=deterministic)
        return x_loc, text_feats, state_pred

    def __call__(self, tokens, text_mask, volume, memory: EpisodicMemory,
                 cur_pos, cur_node_idx,
                 text_feats: Optional[jnp.ndarray] = None,
                 vol_tokens: Optional[jnp.ndarray] = None,
                 obj_feats: Optional[jnp.ndarray] = None,
                 obj_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> PolicyOutput:
        """One decision step.

        tokens (B, L) int32 / text_mask (B, L); volume (B, bev_num, C) —
        the current viewpoint's VER; memory — episodic map; cur_pos (B, 3);
        cur_node_idx (B,) slot of the current node; obj_feats
        (B, max_objects, C) + obj_valid (B, max_objects) — candidate
        objects at the current viewpoint (REVERIE grounding).
        """
        cfg = self.cfg
        b = tokens.shape[0]
        # -- local branch: instruction <-> current VER volume
        x_loc, text_feats, state_pred = self.local_fusion(
            tokens, text_mask, volume, text_feats=text_feats,
            vol_tokens=vol_tokens, deterministic=deterministic)
        local_ctx = self.local_ctx_proj(jnp.mean(x_loc, axis=1))  # (B, C)

        # -- global branch: instruction <-> episodic memory nodes
        rel = memory.positions - cur_pos[:, None, :]
        node_tok = (memory.features.astype(cfg.dtype)
                    + self.pos_mlp(rel.astype(cfg.dtype))
                    + self.visited_embed[memory.visited.astype(jnp.int32)])
        stop = jnp.broadcast_to(self.stop_token[None, None, :],
                                (b, 1, cfg.embed_dims)).astype(cfg.dtype)
        # ground the stop token in the local context (stop decision depends
        # on the fine-grained volume, not just the map)
        stop = stop + local_ctx[:, None, :]
        x = jnp.concatenate([stop, node_tok], axis=1)    # (B, 1+N, C)
        xmask = jnp.concatenate(
            [jnp.ones((b, 1), bool), memory.valid], axis=1)
        for blk in self.global_blocks:
            x = blk(x, xmask, text_feats, text_mask,
                    deterministic=deterministic)

        obj_logits = None
        if obj_feats is not None:
            # dot-product grounding: the instruction-grounded local context
            # against each candidate object's feature
            g = self.ground_proj(local_ctx)              # (B, C)
            obj_logits = jnp.einsum(
                "bc,boc->bo", g.astype(jnp.float32),
                obj_feats.astype(jnp.float32))
            obj_logits = obj_logits / jnp.sqrt(float(cfg.embed_dims))
            if obj_valid is not None:
                obj_logits = jnp.where(obj_valid, obj_logits, -1e9)

        logits = self.score_head(x).squeeze(-1)          # (B, 1+N)
        # action mask: stop always allowed; nodes must exist and not be the
        # current node (DUET global action space)
        node_ok = memory.valid & ~(
            jax.nn.one_hot(cur_node_idx, cfg.max_nodes, dtype=jnp.int32)
            .astype(bool))
        ok = jnp.concatenate([jnp.ones((b, 1), bool), node_ok], axis=1)
        logits = jnp.where(ok, logits, -1e9)
        return PolicyOutput(logits, state_pred, text_feats, obj_logits)


def masked_grounding_ce(obj_logits: jnp.ndarray,
                        gt_obj: jnp.ndarray) -> jnp.ndarray:
    """REVERIE grounding cross-entropy averaged over the steps whose
    viewpoint holds the referred object (``gt_obj >= 0``; -1 rows
    contribute nothing).  One owner for the imitation
    (rollout.imitation_step_loss) and pretraining (pretrain OG task)
    objectives."""
    has = gt_obj >= 0
    glogp = jax.nn.log_softmax(obj_logits, axis=-1)
    picked = jnp.take_along_axis(
        glogp, jnp.maximum(gt_obj, 0)[:, None], axis=1)[:, 0]
    return -jnp.sum(jnp.where(has, picked, 0.0)) / jnp.maximum(
        jnp.sum(has), 1)
