"""DUET/LXMERT cross-modal pretrained-weight conversion.

The paper's agent (arXiv 2403.14158) inherits the DUET/HAMT pretrained
stack: a BERT text encoder (handled by
:func:`vln_ver_tpu.agent.text.convert_hf_bert_params`) plus *cross-modal
x-layers* — LXMERT-style blocks where the vision stream cross-attends the
instruction, self-attends, and runs an FFN, all with post-LN residuals.
``VLNPolicy(fusion_arch="bert")`` reproduces that layout exactly, so a
torch state dict converts function-preservingly (parity test:
``tests/test_crossmodal_convert.py``).

Key schema accepted (DUET ``vilmodel.py`` LXRTXLayer / HF LXMERT
``LxmertXLayer``), per layer under ``{prefix}x_layers.{i}.``:

    crossattention.att.{query,key,value}.{weight,bias}   (or .self.)
    crossattention.output.{dense.{weight,bias},LayerNorm.{weight,bias}}
    visn_self_att.self.{query,key,value}.{weight,bias}
    visn_self_att.output.{dense,LayerNorm}...
    visn_inter.dense.{weight,bias}
    visn_output.{dense,LayerNorm}...

HF LXMERT's ``visual_attention.att`` / ``visn_self_att.self`` aliases are
handled; the language-stream halves (``lang_self_att`` etc.) are ignored —
the policy's fusion blocks are one-directional like DUET's.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["detect_x_layers", "convert_crossmodal_params"]


def _np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v, np.float32)


def detect_x_layers(state_dict: Dict[str, "np.ndarray"],
                    prefix_hint: str | None = None):
    """Find cross-modal stacks: returns {prefix: num_layers}.

    A prefix is everything before ``x_layers.N.`` (DUET has two stacks,
    e.g. ``global_encoder.`` and ``local_encoder.``; HF LXMERT one,
    ``lxmert.encoder.``).
    """
    pat = re.compile(r"^(.*?)x_layers\.(\d+)\.")
    stacks: Dict[str, int] = {}
    for k in state_dict:
        m = pat.match(k)
        if m and (prefix_hint is None or m.group(1).startswith(prefix_hint)):
            p = m.group(1)
            stacks[p] = max(stacks.get(p, 0), int(m.group(2)) + 1)
    return stacks


def convert_crossmodal_params(state_dict: Dict[str, "np.ndarray"],
                              num_layers: int, num_heads: int,
                              prefix: str = "") -> Dict[str, dict]:
    """Map one x-layer stack onto fusion-block params.

    Returns ``{"block_0": {...}, ...}`` — per-layer param dicts matching
    ``_FusionBlock`` with ``fusion_arch="bert"``; the caller installs them
    under ``local_block_i`` / ``global_block_i``.  Fails loudly on missing
    keys (no silent partial grafts).
    """
    def get(name):
        for cand in (name,
                     name.replace("crossattention.att.",
                                  "crossattention.self."),
                     name.replace("crossattention.", "visual_attention.")):
            full = prefix + cand
            if full in state_dict:
                return _np(state_dict[full])
        raise KeyError(f"{prefix + name} (tried crossattention.att/.self "
                       "and visual_attention.* aliases)")

    first = get("x_layers.0.crossattention.att.query.weight")
    hidden = first.shape[1]
    assert hidden % num_heads == 0, (hidden, num_heads)
    hd = hidden // num_heads

    def attn(pre_qkv, pre_out):
        a = {}
        for ours, theirs in (("query", "query"), ("key", "key"),
                             ("value", "value")):
            w = get(f"{pre_qkv}.{theirs}.weight")     # torch out-major
            b = get(f"{pre_qkv}.{theirs}.bias")
            a[ours] = {"kernel": w.T.reshape(hidden, num_heads, hd),
                       "bias": b.reshape(num_heads, hd)}
        wo = get(f"{pre_out}.dense.weight")
        a["out"] = {"kernel": wo.T.reshape(num_heads, hd, hidden),
                    "bias": get(f"{pre_out}.dense.bias")}
        ln = {"scale": get(f"{pre_out}.LayerNorm.weight"),
              "bias": get(f"{pre_out}.LayerNorm.bias")}
        return a, ln

    blocks: Dict[str, dict] = {}
    for i in range(num_layers):
        pre = f"x_layers.{i}."
        ca, ln_ca = attn(pre + "crossattention.att",
                         pre + "crossattention.output")
        sa, ln_sa = attn(pre + "visn_self_att.self",
                         pre + "visn_self_att.output")
        blocks[f"block_{i}"] = {
            "cross_attn": ca, "ln_ca": ln_ca,
            "self_attn": sa, "ln_sa": ln_sa,
            "fc1": {"kernel": get(pre + "visn_inter.dense.weight").T,
                    "bias": get(pre + "visn_inter.dense.bias")},
            "fc2": {"kernel": get(pre + "visn_output.dense.weight").T,
                    "bias": get(pre + "visn_output.dense.bias")},
            "ln_ffn": {"scale": get(pre + "visn_output.LayerNorm.weight"),
                       "bias": get(pre + "visn_output.LayerNorm.bias")},
        }
    return blocks
