"""VLN pretraining stage: DUET-lineage proxy tasks over offline episodes.

The paper's agent (arXiv 2403.14158 §3.5) inherits DUET's pretrain-then-
finetune recipe: before imitation/DAgger training, the cross-modal stack is
trained on OFFLINE instruction-path data with proxy objectives.  This
module provides the TPU-native equivalent over VER volumes:

* **MLM** — masked language modeling on instructions, vision-conditioned:
  the masked instruction runs through the shared text encoder, the current
  viewpoint's VER volume through the shared tokenizer + local fusion
  blocks, and a pretrain-only cross-attention + head predicts the masked
  tokens from fused volume context (DUET's MLM through the cross-modal
  stack; the extra head is discarded at finetune, as upstream).
* **SAP** — single-step action prediction: the FULL policy (local + global
  branches + episodic memory) predicts the teacher's next action on
  offline teacher trajectories (DUET's SAP proxy task).
* **OG** — object grounding (REVERIE): CE on the policy's object logits at
  viewpoints holding the referred object.
* **VSE** — volume state estimation aux (the paper's own auxiliary task)
  when state targets are present.

All shared modules (text encoder, VER tokenizer, fusion blocks, score
heads) receive gradients; ``VLNPretrainModel`` nests the actual
``VLNPolicy`` as a submodule, so the pretrained subtree
``params['params']['policy']`` drops into finetuning unchanged
(``tools/train_vln.py --init-from-pretrain``).

Offline data: teacher-driven traces (no policy needed — episodic-memory
maintenance is policy-parameter-free, see rollout.run_episode) collected
by :func:`collect_teacher_trace`, batched by :func:`stack_records`.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .env import R2REnv
from .memory import init_memory, memory_from_arrays
from .policy import (PolicyConfig, VLNPolicy,
                     masked_grounding_ce)


def mask_tokens(rng: jax.Array, tokens: jnp.ndarray, vocab_size: int,
                mask_id: int = 1, mask_prob: float = 0.15,
                special_ids: tuple = ()):
    """BERT-recipe masking: of the ``mask_prob`` selected non-pad
    positions, 80% -> ``mask_id``, 10% -> random token, 10% unchanged.

    Returns (masked_tokens, targets, target_mask).  Pad (token 0) and any
    ``special_ids`` ([CLS]/[SEP] with a WordPiece vocab — BERT's
    create_masked_lm_predictions skips them too) are never selected;
    ``targets`` equals ``tokens`` everywhere, supervised only where
    ``target_mask``.
    """
    r_sel, r_op, r_tok = jax.random.split(rng, 3)
    is_real = tokens > 0
    for sid in special_ids:            # static tuple, unrolls at trace
        is_real &= tokens != sid
    sel = (jax.random.uniform(r_sel, tokens.shape) < mask_prob) & is_real
    op = jax.random.uniform(r_op, tokens.shape)
    rand_tok = jax.random.randint(r_tok, tokens.shape, 2, vocab_size)
    masked = jnp.where(sel & (op < 0.8), mask_id, tokens)
    masked = jnp.where(sel & (op >= 0.8) & (op < 0.9), rand_tok, masked)
    return masked, tokens, sel


class VLNPretrainModel(nn.Module):
    """The policy plus pretrain-only MLM machinery."""

    cfg: PolicyConfig

    def setup(self):
        cfg = self.cfg
        self.policy = VLNPolicy(cfg, name="policy")
        # pretrain-only (discarded at finetune): text attends the fused
        # volume tokens, then a BERT-style transform head predicts vocab
        self.mlm_cross = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="mlm_cross")
        self.mlm_ln = nn.LayerNorm(dtype=cfg.dtype, name="mlm_ln")
        self.mlm_dense = nn.Dense(cfg.embed_dims, dtype=cfg.dtype,
                                  name="mlm_dense")
        self.mlm_ln2 = nn.LayerNorm(dtype=cfg.dtype, name="mlm_ln2")
        self.mlm_out = nn.Dense(self.cfg.vocab_size, dtype=jnp.float32,
                                name="mlm_out")

    def mlm_logits(self, masked_tokens, text_mask, volume,
                   vol_tokens=None,
                   deterministic: bool = True) -> jnp.ndarray:
        """(B, L, vocab) vision-conditioned MLM prediction."""
        x_loc, text_feats, _ = self.policy.local_fusion(
            masked_tokens, text_mask, volume, vol_tokens=vol_tokens,
            deterministic=deterministic)
        y = self.mlm_cross(text_feats, inputs_k=x_loc,
                           deterministic=deterministic)
        h = self.mlm_ln(text_feats + y)
        h = nn.gelu(self.mlm_dense(h))
        h = self.mlm_ln2(h)
        return self.mlm_out(h)

    def __call__(self, batch: Dict, masked_tokens, mlm_targets, mlm_mask,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """All proxy losses for one offline decision-step batch.

        ``batch``: the imitation batch contract (rollout.stack_records):
        instruction (B, L), volume (B, nvox, C), memory, cur_pos, cur_slot,
        teacher (B,), optional obj_feats/obj_valid/gt_obj, optional
        state_targets (B, 5).
        """
        text_mask = batch["instruction"] > 0
        obj_kw = {}
        if "obj_feats" in batch:
            obj_kw = dict(obj_feats=batch["obj_feats"],
                          obj_valid=batch["obj_valid"])
        # volume tokenization is text-independent: run the VERTokenizer
        # ONCE and feed both the SAP policy pass (clean text) and the MLM
        # pass (masked text) — it is the heaviest non-fusion compute here
        vol_tokens = self.policy.tokenize_volume(
            batch["volume"], deterministic=deterministic)
        out = self.policy(batch["instruction"], text_mask, batch["volume"],
                          batch["memory"], batch["cur_pos"],
                          batch["cur_slot"], vol_tokens=vol_tokens,
                          deterministic=deterministic,
                          **obj_kw)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        sap = -jnp.take_along_axis(logp, batch["teacher"][:, None],
                                   axis=1).mean()

        logits = self.mlm_logits(masked_tokens, text_mask, batch["volume"],
                                 vol_tokens=vol_tokens,
                                 deterministic=deterministic)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, mlm_targets[..., None],
                                   axis=-1)[..., 0]
        mlm = jnp.sum(jnp.where(mlm_mask, nll, 0.0)) / jnp.maximum(
            jnp.sum(mlm_mask), 1)

        losses = dict(sap=sap, mlm=mlm)
        if out.obj_logits is not None and "gt_obj" in batch:
            losses["og"] = masked_grounding_ce(out.obj_logits,
                                               batch["gt_obj"])
        if "state_targets" in batch:
            losses["vse"] = jnp.mean(
                (out.state_pred - batch["state_targets"]) ** 2)
        return losses


def pretrain_loss(model: VLNPretrainModel, params, batch, rng,
                  mask_id: int = 1, deterministic: bool = False,
                  special_ids: tuple = ()):
    """Total pretraining loss (equal task weights, DUET-style)."""
    r_mask, r_drop = jax.random.split(rng)
    masked, targets, sel = mask_tokens(r_mask, batch["instruction"],
                                       model.cfg.vocab_size,
                                       mask_id=mask_id,
                                       special_ids=special_ids)
    losses = model.apply(params, batch, masked, targets, sel,
                         deterministic=deterministic,
                         rngs={"dropout": r_drop})
    total = sum(losses.values())
    return total, losses


def collect_teacher_trace(env: R2REnv, ep_idx: int,
                          cfg: PolicyConfig) -> List[Dict]:
    """Offline teacher trajectory: records shaped exactly like
    rollout.run_episode(collect_teacher=True) traces, but stepping with
    the TEACHER action (pure expert data, no policy involved — the
    episodic-memory maintenance below mirrors rollout.run_episode, which
    is policy-parameter-free)."""
    state = env.reset(ep_idx)
    trace: List[Dict] = []
    while not state["done"]:
        obs = env.observe(state)
        # one shared memory builder with rollout.run_episode (correct
        # under slot recycling — env.memory_arrays docstring); host-only:
        # no policy runs here, so the memory never needs to touch the
        # device (stack_records converts once at batch time)
        mem = memory_from_arrays([env.memory_arrays(state)], host=True)
        teacher = env.teacher_action(state)
        trace.append(dict(obs=obs, teacher=teacher, memory=mem))
        env.step(state, teacher)
    return trace


def stack_records(recs: List[Dict]) -> Dict:
    """Stack per-step records into one static-shape batch (shared with the
    imitation trainer's contract)."""
    obs0 = recs[0]["obs"]
    batch = dict(
        instruction=jnp.stack(
            [jnp.asarray(r["obs"]["instruction"]) for r in recs]),
        volume=jnp.stack(
            [jnp.asarray(r["obs"]["volume"]) for r in recs]),
        memory=jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0),
            *[r["memory"] for r in recs]),
        cur_pos=jnp.stack(
            [jnp.asarray(r["obs"]["cur_pos"]) for r in recs]),
        cur_slot=jnp.asarray(
            [r["obs"]["cur_slot"] for r in recs], jnp.int32),
        teacher=jnp.asarray([r["teacher"] for r in recs], jnp.int32))
    if "obj_feats" in obs0:
        batch["obj_feats"] = jnp.stack(
            [jnp.asarray(r["obs"]["obj_feats"]) for r in recs])
        batch["obj_valid"] = jnp.stack(
            [jnp.asarray(r["obs"]["obj_valid"]) for r in recs])
        batch["gt_obj"] = jnp.asarray(
            [r["obs"]["gt_obj"] for r in recs], jnp.int32)
    return batch


def init_pretrain_params(model: VLNPretrainModel, env: R2REnv, seed: int,
                         objects: bool = False):
    """Initialize the pretrain model from one env observation."""
    cfg = model.cfg
    obs = env.observe(env.reset(0))
    mem0 = init_memory(1, cfg.max_nodes, cfg.embed_dims)
    batch = dict(
        instruction=jnp.asarray(obs["instruction"])[None],
        volume=jnp.asarray(obs["volume"])[None],
        memory=mem0,
        cur_pos=jnp.asarray(obs["cur_pos"])[None],
        cur_slot=jnp.asarray(obs["cur_slot"])[None],
        teacher=jnp.zeros((1,), jnp.int32))
    if objects:
        batch["obj_feats"] = jnp.asarray(obs["obj_feats"])[None]
        batch["obj_valid"] = jnp.asarray(obs["obj_valid"])[None]
        batch["gt_obj"] = jnp.asarray(obs["gt_obj"])[None]
    masked, targets, sel = mask_tokens(
        jax.random.PRNGKey(seed), batch["instruction"], cfg.vocab_size)
    return model.init(jax.random.PRNGKey(seed), batch, masked, targets,
                      sel, deterministic=True)


def extract_policy_params(pretrain_params) -> Dict:
    """Pretrained tree -> the VLNPolicy tree for finetuning (drops the
    pretrain-only MLM head, as DUET does)."""
    return {"params": pretrain_params["params"]["policy"]}
