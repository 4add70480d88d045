#!/usr/bin/env python
"""Convert a pretrained HuggingFace BERT checkpoint into TextEncoder params.

The VLN policy's instruction branch (`vln_ver_tpu/agent/text.py`) supports
``arch="bert"`` — the exact HF ``BertModel`` encoder layout — so pretrained
weights (as used by the paper's DUET/HAMT lineage) drop in
function-preservingly.  This tool maps a torch state dict onto the flax
tree and writes a msgpack file consumable by
``tools/train_vln.py --text-init``.

Sources accepted by --src:
  * a torch checkpoint file (``pytorch_model.bin`` / ``*.pt``) holding a
    BertModel state dict, optionally nested under ``state_dict``/``model``
    and/or prefixed ``bert.``;
  * a HF model directory containing ``pytorch_model.bin``.

Usage:
  python tools/convert_text_encoder.py --src /path/to/bert --out bert.msgpack
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(src: str):
    import torch
    path = src
    if os.path.isdir(src):
        for name in ("pytorch_model.bin", "model.pt", "model.bin"):
            cand = os.path.join(src, name)
            if os.path.isfile(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no torch checkpoint in {src}")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {k: v for k, v in sd.items() if hasattr(v, "shape")}


def detect_layout(sd):
    """Infer (prefix, num_layers, num_heads-compatible hidden) from keys."""
    prefix = ""
    if not any(k.startswith("embeddings.") for k in sd):
        for cand in ("bert.", "encoder.", "lxrt_encoder.model.bert."):
            if any(k.startswith(cand + "embeddings.") for k in sd):
                prefix = cand
                break
    layers = set()
    pat = re.compile(re.escape(prefix) + r"encoder\.layer\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            layers.add(int(m.group(1)))
    if not layers:
        raise ValueError("no encoder.layer.N keys found "
                         f"(prefix detected: {prefix!r})")
    return prefix, max(layers) + 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--max-len", type=int, default=None,
                   help="truncate the position table (default: keep all)")
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import flax.serialization

    from vln_ver_tpu.agent.text import convert_hf_bert_params

    sd = load_state_dict(args.src)
    prefix, num_layers = detect_layout(sd)
    tree = convert_hf_bert_params(sd, num_layers=num_layers,
                                  num_heads=args.heads, prefix=prefix)
    if args.max_len is not None:
        tree["params"]["pos_embed"] = np.ascontiguousarray(
            tree["params"]["pos_embed"][:args.max_len])
    params = tree["params"]
    hidden = params["token_embed"]["embedding"].shape[1]
    meta = dict(num_layers=num_layers, num_heads=args.heads,
                hidden=hidden,
                vocab_size=params["token_embed"]["embedding"].shape[0],
                max_len=params["pos_embed"].shape[0],
                ffn_dim=params["fc1_0"]["kernel"].shape[1])
    blob = flax.serialization.msgpack_serialize(
        {"meta": {k: np.int32(v) for k, v in meta.items()},
         "params": params})
    with open(args.out, "wb") as f:
        f.write(blob)
    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree.leaves(params))
    print(f"converted {n/1e6:.1f}M params "
          f"({num_layers} layers, hidden {hidden}) -> {args.out}")
    print("meta:", meta)


if __name__ == "__main__":
    main()
