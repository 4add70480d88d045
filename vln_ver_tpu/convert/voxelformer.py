"""Reference (torch) VoxelFormer checkpoint -> flax param-tree converter.

Maps the reference model's ``state_dict`` names (detector
``voxelformer.py``, head ``voxelformer_occupancy_head.py:180-258``,
transformer ``voxel_transformer.py:78-96``, encoder ``voxel_encoder.py``
via mmcv ``MyCustomBaseTransformerLayer`` naming, decoder
``voxel_decoder.py:135-229`` + mmcv ``DetrTransformerDecoderLayer``) onto
this repo's flax tree (models/{detector,head,transformer,encoder,decoder,
attention,positional}.py).

Conventions:
  * torch ``nn.Linear`` weight is (out, in); flax Dense kernel is
    (in, out) -> transpose.
  * torch ``nn.LayerNorm`` weight -> flax ``scale``.
  * torch ``nn.MultiheadAttention`` packs q/k/v in ``in_proj_weight``
    (3E, E); flax MultiHeadDotProductAttention uses per-projection
    kernels (E, H, D).
  * torch ``nn.ConvTranspose3d`` weight is (in, out, kD, kH, kW); our
    upsampler kernel is the correlation form (kD, kH, kW, in, out)
    **spatially flipped** (transposed conv == flipped-kernel correlation;
    mapping verified to 1e-7 against torch in
    tests/test_convert_voxelformer.py).

The reference checkpoint also contains ``img_backbone.*`` / ``img_neck.*``
(ResNet+FPN) — dead on the active MP3D path (the dataset supplies
precomputed ViT features, voxelformer.py:282-289) — and loss buffers
(``code_weights``); both are skipped.  ``convert_state_dict`` returns the
mapped tree plus the list of skipped keys so callers can assert nothing
load-bearing was dropped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..models.config import VERConfig

# state_dict keys that exist in the reference but carry no forward
# semantics on the active path
_SKIP_PREFIXES = ("img_backbone.", "img_neck.")
_SKIP_KEYS = ("pts_bbox_head.code_weights",)


def _lin(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {"kernel": np.ascontiguousarray(sd[name + ".weight"].T),
            "bias": np.asarray(sd[name + ".bias"])}


def _ln(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _mha(sd: Dict[str, np.ndarray], name: str, num_heads: int) -> dict:
    """mmcv MultiheadAttention wrapper (``.attn`` = nn.MultiheadAttention)
    -> flax MultiHeadDotProductAttention tree."""
    w = np.asarray(sd[name + ".attn.in_proj_weight"])   # (3E, E)
    b = np.asarray(sd[name + ".attn.in_proj_bias"])     # (3E,)
    e = w.shape[1]
    d = e // num_heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wmat, bvec):
        return {"kernel": np.ascontiguousarray(
                    wmat.T.reshape(e, num_heads, d)),
                "bias": bvec.reshape(num_heads, d)}

    ow = np.asarray(sd[name + ".attn.out_proj.weight"])  # (E, E)
    ob = np.asarray(sd[name + ".attn.out_proj.bias"])
    return {
        "attn": {
            "query": proj(qw, qb),
            "key": proj(kw, kb),
            "value": proj(vw, vb),
            "out": {"kernel": np.ascontiguousarray(
                        ow.T.reshape(num_heads, d, e)),
                    "bias": ob},
        }
    }


def _conv_t3d(sd: Dict[str, np.ndarray], name: str) -> dict:
    """torch ConvTranspose3d -> _UpStage correlation kernel."""
    w = np.asarray(sd[name + ".weight"])  # (in, out, kD, kH, kW)
    k = w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(sd[name + ".bias"])}


def _seq_lnrelu(sd, base: str, num_fcs: int) -> dict:
    """(Linear, LN, ReLU) x n + Linear sequential (cls/occ branches,
    head:183-189/242-248): torch indices 0,1,3,4,...,3n."""
    out = {}
    for i in range(num_fcs):
        out[f"fc{i}"] = _lin(sd, f"{base}.{3 * i}")
        out[f"ln{i}"] = _ln(sd, f"{base}.{3 * i + 1}")
    out["out"] = _lin(sd, f"{base}.{3 * num_fcs}")
    return out


def _seq_relu(sd, base: str, num_fcs: int) -> dict:
    """(Linear, ReLU) x n + Linear (reg/layout branches,
    head:191-203): torch indices 0,2,...,2n."""
    out = {}
    for i in range(num_fcs):
        out[f"fc{i}"] = _lin(sd, f"{base}.{2 * i}")
    out["out"] = _lin(sd, f"{base}.{2 * num_fcs}")
    return out


def _deform(sd, base: str, with_output_proj: bool) -> dict:
    out = {
        "value_proj": _lin(sd, base + ".value_proj"),
        "sampling_offsets": _lin(sd, base + ".sampling_offsets"),
        "attention_weights": _lin(sd, base + ".attention_weights"),
    }
    if with_output_proj:
        out["output_proj"] = _lin(sd, base + ".output_proj")
    return out


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: VERConfig
                       ) -> Tuple[dict, List[str]]:
    """Reference state_dict (torch names -> numpy arrays) -> this repo's
    ``params['params']`` tree for ``VoxelFormer``.

    Returns (params_tree, skipped_keys).  Raises KeyError on any expected
    reference key that is absent, so silent partial conversion is
    impossible.
    """
    if cfg.use_temporal_self_attn:
        raise NotImplementedError(
            "convert_state_dict: temporal (TSA) configs are not mapped "
            "— the per-layer temporal_self_attn/norm0 params would be "
            "silently dropped.  The reference's shipped configs are "
            "non-temporal (vocc.py); extend the mapping before "
            "converting a temporal checkpoint.")
    sd = {k: np.asarray(v) for k, v in sd.items()}
    consumed = set()

    orig_get = sd.__getitem__

    class _Track(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return orig_get(k)

        def __contains__(self, k):
            return k in sd

    tsd = _Track(sd)

    h = "pts_bbox_head"
    head: dict = {}

    head["voxel_embedding"] = tsd[f"{h}.voxel_embedding.weight"]
    head["positional_encoding"] = {
        "row_embed": tsd[f"{h}.positional_encoding.row_embed.weight"],
        "col_embed": tsd[f"{h}.positional_encoding.col_embed.weight"],
        "z_embed": tsd[f"{h}.positional_encoding.z_embed.weight"],
    }

    if not cfg.only_occ:
        head["query_embedding"] = tsd[f"{h}.query_embedding.weight"]
        head["query_layout_embedding"] = tsd[
            f"{h}.query_layout_embedding.weight"]
        for l in range(cfg.decoder_layers):
            head[f"cls_branch_{l}"] = _seq_lnrelu(
                tsd, f"{h}.cls_branches.{l}", cfg.num_reg_fcs)
        if cfg.add_layout:
            for l in range(cfg.decoder_layers):
                head[f"layout_branch_{l}"] = _seq_relu(
                    tsd, f"{h}.layout_branches.{l}", cfg.num_reg_fcs)

    if not cfg.only_det:
        head["occ_proj"] = _lin(tsd, f"{h}.occ_proj")
        head["occ_branches"] = _seq_lnrelu(
            tsd, f"{h}.occ_branches", cfg.num_occ_fcs)
        if cfg.refine_occ:
            up = {}
            i = 0
            while f"{h}.up_sample.{i}.weight" in tsd:
                up[f"up{i}"] = _conv_t3d(tsd, f"{h}.up_sample.{i}")
                i += 1
            head["up_sample"] = up

    # -- transformer ---------------------------------------------------
    t = f"{h}.transformer"
    tr: dict = {
        "cams_embeds": tsd[f"{t}.cams_embeds"],
        "level_embeds": tsd[f"{t}.level_embeds"],
    }
    for i in range(cfg.encoder_layers):
        el = f"{t}.encoder.layers.{i}"
        tr.setdefault("encoder", {})[f"layer_{i}"] = {
            "cross_attn": {
                "deformable_attention": _deform(
                    tsd, f"{el}.attentions.0.deformable_attention",
                    with_output_proj=False),
                "output_proj": _lin(tsd, f"{el}.attentions.0.output_proj"),
            },
            "norm1": _ln(tsd, f"{el}.norms.0"),
            "ffn": {"fc1": _lin(tsd, f"{el}.ffns.0.layers.0.0"),
                    "fc2": _lin(tsd, f"{el}.ffns.0.layers.1")},
            "norm2": _ln(tsd, f"{el}.norms.1"),
        }

    if not cfg.only_occ:
        tr["reference_points"] = _lin(tsd, f"{t}.reference_points")
        for i in range(cfg.decoder_layers):
            dl = f"{t}.decoder.layers.{i}"
            tr.setdefault("decoder", {})[f"layer_{i}"] = {
                "self_attn": _mha(tsd, f"{dl}.attentions.0",
                                  cfg.num_heads),
                "norm1": _ln(tsd, f"{dl}.norms.0"),
                "cross_attn": _deform(tsd, f"{dl}.attentions.1",
                                      with_output_proj=True),
                "norm2": _ln(tsd, f"{dl}.norms.1"),
                "ffn": {"fc1": _lin(tsd, f"{dl}.ffns.0.layers.0.0"),
                        "fc2": _lin(tsd, f"{dl}.ffns.0.layers.1")},
                "norm3": _ln(tsd, f"{dl}.norms.2"),
            }
            # reg branches live inside our transformer (decoder-side
            # refinement); reference keeps them on the head
            tr[f"reg_branch_{i}"] = _seq_relu(
                tsd, f"{h}.reg_branches.{i}", cfg.num_reg_fcs)
        if cfg.decoder_on_bev and cfg.voxel_2_bev_type == "mlp":
            tr["voxel2bev"] = {
                "layers_0": _lin(tsd, f"{t}.voxel2bev.0"),
                "layers_1": _ln(tsd, f"{t}.voxel2bev.1"),
                "layers_3": _lin(tsd, f"{t}.voxel2bev.3"),
                "layers_4": _ln(tsd, f"{t}.voxel2bev.4"),
            }

    head["transformer"] = tr

    skipped = sorted(set(sd) - consumed)
    # fail loudly on unexpected leftovers (anything not a known-dead key)
    unexpected = [
        k for k in skipped
        if not k.startswith(_SKIP_PREFIXES) and k not in _SKIP_KEYS
        # the reference builds layout_branches UNCONDITIONALLY
        # (head._init_layers), so with cfg.add_layout=False they are
        # expected leftovers; with add_layout=True they were consumed
        # above (line ~166) and never reach `skipped`
        and not k.startswith(f"{h}.layout_branches.")
        and "num_batches_tracked" not in k
    ]
    if unexpected:
        raise KeyError(
            "convert_state_dict: unmapped reference keys "
            f"(first 10): {unexpected[:10]}")
    return {"pts_bbox_head": head}, skipped


# ---------------------------------------------------------------------------
# Reverse direction: flax param tree -> reference state_dict.
#
# Inverts every mapping above exactly (transposes/reshapes/flips are
# involutions), so convert_state_dict(export_state_dict(p)) == p bitwise.
# This lets a model trained here be exported as a reference-format
# checkpoint that the torch codebase (or any downstream torch consumer)
# loads by name — the missing keys are only the reference's dead
# ``img_backbone/img_neck`` (unused on the active MP3D path,
# voxelformer.py:282-289) and the ``code_weights`` loss buffer.
# ---------------------------------------------------------------------------


def _np32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _unlin(out: Dict[str, np.ndarray], name: str, tree: dict) -> None:
    out[name + ".weight"] = _np32(tree["kernel"]).T.copy()
    out[name + ".bias"] = _np32(tree["bias"])


def _unln(out: Dict[str, np.ndarray], name: str, tree: dict) -> None:
    out[name + ".weight"] = _np32(tree["scale"])
    out[name + ".bias"] = _np32(tree["bias"])


def _unmha(out: Dict[str, np.ndarray], name: str, tree: dict) -> None:
    attn = tree["attn"]

    def unproj(t):
        k = _np32(t["kernel"])            # (E, H, D)
        e = k.shape[0]
        return k.reshape(e, e).T.copy(), _np32(t["bias"]).reshape(e)

    qw, qb = unproj(attn["query"])
    kw, kb = unproj(attn["key"])
    vw, vb = unproj(attn["value"])
    out[name + ".attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
    out[name + ".attn.in_proj_bias"] = np.concatenate([qb, kb, vb], 0)
    ok = _np32(attn["out"]["kernel"])     # (H, D, E)
    e = ok.shape[2]
    out[name + ".attn.out_proj.weight"] = ok.reshape(e, e).T.copy()
    out[name + ".attn.out_proj.bias"] = _np32(attn["out"]["bias"])


def _unconv_t3d(out: Dict[str, np.ndarray], name: str, tree: dict) -> None:
    k = _np32(tree["kernel"])             # (kD,kH,kW,in,out), flipped
    out[name + ".weight"] = np.ascontiguousarray(
        k[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2))
    out[name + ".bias"] = _np32(tree["bias"])


def _unseq_lnrelu(out, base: str, tree: dict, num_fcs: int) -> None:
    for i in range(num_fcs):
        _unlin(out, f"{base}.{3 * i}", tree[f"fc{i}"])
        _unln(out, f"{base}.{3 * i + 1}", tree[f"ln{i}"])
    _unlin(out, f"{base}.{3 * num_fcs}", tree["out"])


def _unseq_relu(out, base: str, tree: dict, num_fcs: int) -> None:
    for i in range(num_fcs):
        _unlin(out, f"{base}.{2 * i}", tree[f"fc{i}"])
    _unlin(out, f"{base}.{2 * num_fcs}", tree["out"])


def _undeform(out, base: str, tree: dict) -> None:
    _unlin(out, base + ".value_proj", tree["value_proj"])
    _unlin(out, base + ".sampling_offsets", tree["sampling_offsets"])
    _unlin(out, base + ".attention_weights", tree["attention_weights"])
    if "output_proj" in tree:
        _unlin(out, base + ".output_proj", tree["output_proj"])


def export_state_dict(params: dict, cfg: VERConfig) -> Dict[str, np.ndarray]:
    """This repo's ``params['params']`` tree -> reference state_dict
    (torch names -> numpy fp32 arrays).

    Exact inverse of :func:`convert_state_dict`: round-tripping is
    bitwise (tests/test_export_voxelformer.py).  The result loads into
    the reference model with ``strict=False`` — missing keys are only
    the dead ``img_backbone/img_neck`` and loss buffers the reference
    registers itself.
    """
    if cfg.use_temporal_self_attn:
        raise NotImplementedError(
            "export_state_dict: temporal (TSA) configs are not mapped "
            "— the per-layer temporal_self_attn/norm0 params would be "
            "silently dropped (fail-loud per the bitwise round-trip "
            "contract).")
    head = params["pts_bbox_head"]
    h = "pts_bbox_head"
    out: Dict[str, np.ndarray] = {}

    out[f"{h}.voxel_embedding.weight"] = _np32(head["voxel_embedding"])
    if "positional_encoding" in head:
        pe = head["positional_encoding"]
    else:
        # inert on the active path (encoder.py docstring), so flax never
        # initialises it unless the temporal variant ran; export zeros of
        # the reference shapes to keep the .pth strict-loadable
        pe = {"row_embed": np.zeros((cfg.bev_h, cfg.embed_dims),
                                    np.float32),
              "col_embed": np.zeros((cfg.bev_w, cfg.embed_dims),
                                    np.float32),
              "z_embed": np.zeros((cfg.bev_z, cfg.embed_dims),
                                  np.float32)}
    for k in ("row_embed", "col_embed", "z_embed"):
        out[f"{h}.positional_encoding.{k}.weight"] = _np32(pe[k])

    if not cfg.only_occ:
        out[f"{h}.query_embedding.weight"] = _np32(head["query_embedding"])
        out[f"{h}.query_layout_embedding.weight"] = _np32(
            head["query_layout_embedding"])
        for l in range(cfg.decoder_layers):
            _unseq_lnrelu(out, f"{h}.cls_branches.{l}",
                          head[f"cls_branch_{l}"], cfg.num_reg_fcs)
        if cfg.add_layout:
            for l in range(cfg.decoder_layers):
                _unseq_relu(out, f"{h}.layout_branches.{l}",
                            head[f"layout_branch_{l}"], cfg.num_reg_fcs)

    if not cfg.only_det:
        _unlin(out, f"{h}.occ_proj", head["occ_proj"])
        _unseq_lnrelu(out, f"{h}.occ_branches", head["occ_branches"],
                      cfg.num_occ_fcs)
        if cfg.refine_occ:
            up = head["up_sample"]
            for i in range(len(up)):
                _unconv_t3d(out, f"{h}.up_sample.{i}", up[f"up{i}"])

    tr = head["transformer"]
    t = f"{h}.transformer"
    out[f"{t}.cams_embeds"] = _np32(tr["cams_embeds"])
    out[f"{t}.level_embeds"] = _np32(tr["level_embeds"])
    for i in range(cfg.encoder_layers):
        el = f"{t}.encoder.layers.{i}"
        lt = tr["encoder"][f"layer_{i}"]
        _undeform(out, f"{el}.attentions.0.deformable_attention",
                  lt["cross_attn"]["deformable_attention"])
        _unlin(out, f"{el}.attentions.0.output_proj",
               lt["cross_attn"]["output_proj"])
        _unln(out, f"{el}.norms.0", lt["norm1"])
        _unlin(out, f"{el}.ffns.0.layers.0.0", lt["ffn"]["fc1"])
        _unlin(out, f"{el}.ffns.0.layers.1", lt["ffn"]["fc2"])
        _unln(out, f"{el}.norms.1", lt["norm2"])

    if not cfg.only_occ:
        _unlin(out, f"{t}.reference_points", tr["reference_points"])
        for i in range(cfg.decoder_layers):
            dl = f"{t}.decoder.layers.{i}"
            lt = tr["decoder"][f"layer_{i}"]
            _unmha(out, f"{dl}.attentions.0", lt["self_attn"])
            _unln(out, f"{dl}.norms.0", lt["norm1"])
            _undeform(out, f"{dl}.attentions.1", lt["cross_attn"])
            _unln(out, f"{dl}.norms.1", lt["norm2"])
            _unlin(out, f"{dl}.ffns.0.layers.0.0", lt["ffn"]["fc1"])
            _unlin(out, f"{dl}.ffns.0.layers.1", lt["ffn"]["fc2"])
            _unln(out, f"{dl}.norms.2", lt["norm3"])
            _unseq_relu(out, f"{h}.reg_branches.{i}",
                        tr[f"reg_branch_{i}"], cfg.num_reg_fcs)
        if cfg.decoder_on_bev and cfg.voxel_2_bev_type == "mlp":
            v2b = tr["voxel2bev"]
            _unlin(out, f"{t}.voxel2bev.0", v2b["layers_0"])
            _unln(out, f"{t}.voxel2bev.1", v2b["layers_1"])
            _unlin(out, f"{t}.voxel2bev.3", v2b["layers_3"])
            _unln(out, f"{t}.voxel2bev.4", v2b["layers_4"])

    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth checkpoint into a name->numpy dict.

    Handles the mmcv checkpoint format ({'state_dict': ..., 'meta': ...})
    as written by the reference tools/train.py.
    """
    import torch

    try:
        # safe path first: tensors-only unpickling (mmcv checkpoints
        # usually load fine); fall back for metadata that needs full
        # pickle — only do that with checkpoints you trust, torch.load's
        # weights_only=False executes arbitrary pickle code
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in sd.items()}
