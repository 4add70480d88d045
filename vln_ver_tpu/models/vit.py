"""ViT-B/16 image feature extractor — the missing first stage of the
reference pipeline.

The reference consumes precomputed ViT-B/16 patch features from
``new_vit_base_patch16_197_imagenet.hdf5`` (mp3docc_dataset.py:131,
voxelformer.py:317-325: key ``{scan}_{vp}_i{cam}_{deg}`` -> (1, 197, 768),
CLS at index 0 stripped at load) but ships no extractor — the HDF5 is an
external artifact of the HAMT/DUET lineage (timm ``vit_base_patch16_224``
pretrained on ImageNet).  This module closes that gap TPU-natively: a
jittable flax ViT whose layout matches HuggingFace ``ViTModel`` exactly, so
pretrained weights convert function-preservingly via
:func:`convert_hf_vit_params` and panorama views can be lifted to features
on-chip (``tools/extract_vit_features.py``).

Architecture (HF ``ViTModel``, pre-LN):
  Conv patch embed (patch_size stride) -> prepend CLS -> +pos embed ->
  N x [LN -> MHA -> residual; LN -> MLP(gelu exact) -> residual] -> final LN.
Inference path only (HF ViT defaults use zero dropout); returns the full
(B, 1 + num_patches, C) token sequence — the caller strips CLS, matching
voxelformer.py:322.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    layer_norm_eps: float = 1e-12  # HF ViTConfig default
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) float, already resized + normalised.
        Returns (B, 1 + num_patches, C) fp32 token features."""
        b, h, w, _ = images.shape
        assert h == self.image_size and w == self.image_size, (
            (h, w), self.image_size)
        x = nn.Conv(self.embed_dims,
                    kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(images.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dims)  # (B, P, C), row-major patches
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dims))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dims)).astype(x.dtype),
             x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.num_patches, self.embed_dims))
        x = x + pos.astype(x.dtype)
        for i in range(self.num_layers):
            y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dims,
                out_features=self.embed_dims, dtype=self.dtype,
                name=f"attn_{i}")(y, inputs_k=y)
            x = x + y
            y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name=f"ln2_{i}")(x)
            y = nn.Dense(self.ffn_dim, dtype=self.dtype, name=f"fc1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name=f"fc2_{i}")(y)
            x = x + y
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="final_norm")(x)
        return x.astype(jnp.float32)


def preprocess_images(images: jnp.ndarray, image_size: int = 224,
                      mean: float = 0.5, std: float = 0.5) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) -> resized + normalised (B, S, S, 3) fp32.

    ANTIALIASED bilinear resize (explicit — jax.image.resize's
    antialiased downscale approximates PIL's BILINEAR, which is what the
    HF ViTImageProcessor for the ViT-B/16 lineage resamples with) + the
    timm/HF ImageNet normalisation (mean=std=0.5 per channel).
    Jittable; runs on device so raw panorama views stream straight to
    the chip.  Fidelity note: a checkpoint trained on features from a
    DIFFERENT host resize (e.g. bicubic) sees a small input drift on
    the fused image path — feed native ``image_size`` views (no resize)
    for bit-matched serving, as the MP3D rig does (224x224 sources).
    """
    import jax
    x = images.astype(jnp.float32) / 255.0
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, x.shape[3]),
            method="bilinear", antialias=True)
    return (x - mean) / std


def vit_feature_frontend(model: ViT, variables, images_u8,
                         mean: float = 0.5, std: float = 0.5):
    """Panorama views -> the lift's per-camera feature grid, on device.

    ``images_u8`` (B, cams, H, W, 3) uint8 raw views ->
    (B, cams, fh, fw, C) fp32 features with the CLS token stripped and
    patches in row-major order — exactly what ``MP3DDataset`` serves from
    the precomputed feature HDF5 (reference voxelformer.py:317-325 reads
    (1, 197, 768) and drops index 0), so ``VoxelFormer`` consumes either
    source interchangeably.  Jit-traceable: get_occ/serve fuse this with
    the lift into ONE program, making uint8 images (5.4 MB/volume at
    36x224x224x3) the only host->device payload instead of 2x the bytes
    of bf16 ViT features.
    """
    b, cams = images_u8.shape[:2]
    x = images_u8.reshape((b * cams,) + images_u8.shape[2:])
    x = preprocess_images(x, model.image_size, mean, std)
    tok = model.apply(variables, x)             # (b*cams, 1+P, C)
    fh = model.image_size // model.patch_size
    return tok[:, 1:, :].reshape(b, cams, fh, fh, model.embed_dims)


def vit_for_ver(ver, patch_size: int = 16, num_layers: int = 12,
                num_heads: int = 12, ffn_ratio: int = 4,
                dtype=None) -> ViT:
    """Build the :class:`ViT` whose output grid matches a
    :class:`~vln_ver_tpu.models.config.VERConfig`'s expected features:
    ``image_size = feat_h * patch_size`` (so fh == feat_h) and
    ``embed_dims = in_channels``.  The full-size config lands on the
    reference's ViT-B/16 @224 exactly (feat 14x14x768)."""
    assert ver.feat_h == ver.feat_w, (ver.feat_h, ver.feat_w)
    return ViT(image_size=ver.feat_h * patch_size, patch_size=patch_size,
               embed_dims=ver.in_channels, num_layers=num_layers,
               num_heads=num_heads, ffn_dim=ffn_ratio * ver.in_channels,
               dtype=dtype if dtype is not None else jnp.float32)


def convert_hf_vit_params(state_dict: Dict[str, "np.ndarray"],
                          num_layers: int, num_heads: int,
                          prefix: str = "") -> dict:
    """Map a HuggingFace ``ViTModel`` torch state dict onto :class:`ViT`
    flax params (function-preserving; the pooler is dropped).

    Values may be torch tensors or numpy arrays; keys may carry a
    ``prefix`` (e.g. ``"vit."`` for classification checkpoints).
    """
    def get(name):
        v = state_dict[prefix + name]
        arr = np.asarray(v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v, np.float32)
        return arr

    proj = get("embeddings.patch_embeddings.projection.weight")
    hidden = proj.shape[0]
    assert hidden % num_heads == 0, (hidden, num_heads)
    hd = hidden // num_heads

    params = {
        "cls_token": get("embeddings.cls_token").reshape(1, 1, hidden),
        "pos_embed": get("embeddings.position_embeddings"),
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": proj.transpose(2, 3, 1, 0),
            "bias": get("embeddings.patch_embeddings.projection.bias")},
        "final_norm": {"scale": get("layernorm.weight"),
                       "bias": get("layernorm.bias")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        attn = {}
        for ours, theirs in (("query", "query"), ("key", "key"),
                             ("value", "value")):
            w = get(p + f"attention.attention.{theirs}.weight")
            bv = get(p + f"attention.attention.{theirs}.bias")
            attn[ours] = {"kernel": w.T.reshape(hidden, num_heads, hd),
                          "bias": bv.reshape(num_heads, hd)}
        wo = get(p + "attention.output.dense.weight")
        attn["out"] = {"kernel": wo.T.reshape(num_heads, hd, hidden),
                       "bias": get(p + "attention.output.dense.bias")}
        params[f"attn_{i}"] = attn
        params[f"ln1_{i}"] = {
            "scale": get(p + "layernorm_before.weight"),
            "bias": get(p + "layernorm_before.bias")}
        params[f"ln2_{i}"] = {
            "scale": get(p + "layernorm_after.weight"),
            "bias": get(p + "layernorm_after.bias")}
        params[f"fc1_{i}"] = {
            "kernel": get(p + "intermediate.dense.weight").T,
            "bias": get(p + "intermediate.dense.bias")}
        params[f"fc2_{i}"] = {
            "kernel": get(p + "output.dense.weight").T,
            "bias": get(p + "output.dense.bias")}
    return {"params": params}
