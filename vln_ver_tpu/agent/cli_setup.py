"""Shared setup for the VLN trainer CLIs (tools/train_vln.py and
tools/pretrain_vln.py).

The pretrain→finetune handoff (``train_vln.py --init-from-pretrain``)
restores a checkpoint against a param template rebuilt from the SAME
config/env plumbing that produced it — so that plumbing must exist in
exactly one copy.  This module owns it: synthetic/real data loading,
``PolicyConfig`` construction, pretrained text/cross-modal conversion
blobs and their architecture overrides, and the param grafts.

Covers the agent half absent from the reference repo (SURVEY.md §0.1);
the pretrained-init lineage follows DUET/HAMT (arXiv 2403.14158 §3.5):
BERT/LXMERT init → proxy-task pretrain → imitation finetune.
"""

from __future__ import annotations

import dataclasses
import os
from types import SimpleNamespace

from .policy import PolicyConfig


def load_text_init(path):
    """Read the converted BERT blob -> (PolicyConfig overrides, params).

    The position table is truncated to the chosen max_text_len so the
    grafted tree matches the module's declared param shape (flax validates
    stored params against init shapes; a 512-row BERT table would
    otherwise fail at apply)."""
    import numpy as _np

    import flax.serialization
    with open(path, "rb") as f:
        blob = flax.serialization.msgpack_restore(f.read())
    meta = {k: int(v) for k, v in blob["meta"].items()}
    max_text_len = min(meta["max_len"], 80)
    overrides = dict(
        text_arch="bert", vocab_size=meta["vocab_size"],
        text_layers=meta["num_layers"], text_ffn_dim=meta["ffn_dim"],
        embed_dims=meta["hidden"],
        max_text_len=max_text_len)
    params = dict(blob["params"])
    params["pos_embed"] = _np.ascontiguousarray(
        params["pos_embed"][:max_text_len])
    return overrides, params


def build_vln_setup(args) -> SimpleNamespace:
    """One-stop CLI setup shared by pretraining and finetuning.

    Reads from ``args``: synthetic, work_dir, embed_dims, objects,
    data_dir, connectivity, ver, benchmark, bert_vocab, and (optional,
    default None/1) text_init, crossmodal_init, mask_id.

    Returns a namespace with: cfg (PolicyConfig incl. pretrained-arch
    overrides), episodes, graphs, ver, objects, mask_id, text_params,
    xmodal.  Param grafts are applied separately via
    :func:`graft_pretrained` (finetune grafts into the policy tree,
    pretraining into the nested ``params['policy']`` subtree).
    """
    from .env import make_synthetic_vln

    # text overrides FIRST: the tokenized instruction length must match
    # the (possibly truncated) position table
    text_overrides, text_params = (None, None)
    if getattr(args, "text_init", None):
        text_overrides, text_params = load_text_init(args.text_init)
    text_len = (text_overrides["max_text_len"] if text_overrides else 80)

    xmodal = None
    if getattr(args, "crossmodal_init", None):
        import flax.serialization
        with open(args.crossmodal_init, "rb") as f:
            xmodal = flax.serialization.msgpack_restore(f.read())

    default_mask_id = getattr(args, "mask_id", 1)
    special_ids: tuple = ()
    if (args.synthetic and args.objects
            and args.objects != "synthetic"):
        raise SystemExit(
            f"--synthetic with --objects {args.objects!r}: a real object "
            "pickle cannot pair with synthetic scans (their viewpoint "
            "tokens won't match) — pass --objects synthetic to rehearse "
            "grounding, or drop --synthetic")
    if args.synthetic:
        # pretrained-arch overrides must shape the SYNTHETIC DATA too:
        # generating 64-dim VER volumes and then replacing embed_dims
        # with BERT's hidden size would crash the tokenizer at init
        dims = (text_overrides["embed_dims"] if text_overrides
                else args.embed_dims or 64)
        tlen = (text_overrides["max_text_len"] if text_overrides else 16)
        vocab = (text_overrides["vocab_size"] if text_overrides else 128)
        cfg = PolicyConfig(embed_dims=dims, num_heads=4, fusion_layers=2,
                           text_layers=2, ffn_dim=2 * dims,
                           vocab_size=vocab,
                           max_text_len=tlen, max_nodes=16, bev_z=2,
                           bev_h=4, bev_w=4, num_query_tokens=4)
        bev_num = cfg.bev_z * cfg.bev_h * cfg.bev_w
        objects = None
        made = make_synthetic_vln(
            os.path.join(args.work_dir, "synvln"), num_scans=2,
            nodes_per_scan=9, num_episodes=16, bev_num=bev_num,
            embed_dims=dims, max_text_len=cfg.max_text_len,
            with_objects=args.objects == "synthetic")
        if args.objects == "synthetic":
            episodes, graphs, ver, objects = made
        else:
            episodes, graphs, ver = made
        mask_id = default_mask_id
    else:
        from .data import (WordPieceVocab, load_graphs, load_r2r_split,
                           load_ver_features)
        dims = args.embed_dims or 768
        vocab0 = (WordPieceVocab(args.bert_vocab)
                  if args.bert_vocab else None)
        episodes, vocab = load_r2r_split(args.data_dir, "train", vocab0,
                                         text_len, prefix=args.benchmark)
        cfg = PolicyConfig(embed_dims=dims, vocab_size=len(vocab))
        graphs = load_graphs(args.connectivity,
                             [e["scan"] for e in episodes])
        ver = load_ver_features(args.ver)
        mask_id = (vocab.stoi.get("[MASK]", default_mask_id)
                   if args.bert_vocab else default_mask_id)
        if args.bert_vocab:
            # BERT's create_masked_lm_predictions never masks the
            # sentence delimiters — exclude them from MLM selection
            special_ids = tuple(
                vocab.stoi[t] for t in ("[CLS]", "[SEP]")
                if t in vocab.stoi)
        objects = None
        if args.objects and args.objects != "synthetic":
            import pickle
            with open(args.objects, "rb") as f:
                objects = pickle.load(f)

    if text_overrides:
        cfg = dataclasses.replace(cfg, **text_overrides)
        print(f"text-init: BERT arch, "
              f"{text_overrides['text_layers']} layers, "
              f"hidden {text_overrides['embed_dims']}, "
              f"vocab {text_overrides['vocab_size']}, "
              f"max_text_len {text_overrides['max_text_len']}")
    if xmodal is not None:
        meta = {k: int(v) for k, v in xmodal["meta"].items()}
        if meta["hidden"] != cfg.embed_dims:
            raise SystemExit(
                f"--crossmodal-init hidden {meta['hidden']} != policy "
                f"embed_dims {cfg.embed_dims} (pair it with a matching "
                "--text-init)")
        cfg = dataclasses.replace(cfg, fusion_arch="bert",
                                  fusion_layers=meta["num_layers"],
                                  num_heads=meta["num_heads"],
                                  ffn_dim=meta["ffn_dim"])
        print(f"crossmodal-init: LXMERT/DUET x-layers, "
              f"{meta['num_layers']} layers, ffn {meta['ffn_dim']}, "
              f"{meta['num_heads']} heads")

    return SimpleNamespace(cfg=cfg, episodes=episodes, graphs=graphs,
                           ver=ver, objects=objects, mask_id=mask_id,
                           special_ids=special_ids,
                           text_params=text_params, xmodal=xmodal)


def graft_pretrained(policy_params: dict, cfg: PolicyConfig,
                     text_params, xmodal) -> dict:
    """Graft converted pretrained weights into a ``VLNPolicy`` param
    subtree in place (the dict holding ``text_encoder`` /
    ``local_block_i`` / ``global_block_i``) and return it."""
    import jax
    import jax.numpy as jnp
    if text_params is not None:
        policy_params["text_encoder"] = jax.tree.map(jnp.asarray,
                                                     text_params)
    if xmodal is not None:
        for i in range(cfg.fusion_layers):
            policy_params[f"local_block_{i}"] = jax.tree.map(
                jnp.asarray, xmodal["local"][f"block_{i}"])
            policy_params[f"global_block_{i}"] = jax.tree.map(
                jnp.asarray, xmodal["global"][f"block_{i}"])
    return policy_params
