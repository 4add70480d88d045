#!/usr/bin/env python
"""ViT-B/16 panorama feature extraction: raw view images -> the reference's
``new_vit_base_patch16_197_imagenet.hdf5`` feature store.

The reference trains/evals from precomputed ViT features
(voxelformer.py:317-325: key ``{scan}_{vp}_i{cam}_{deg}`` -> (1, 197, 768))
but never ships the extractor.  This CLI is the TPU-native one: a jitted
flax ViT (``vln_ver_tpu.models.vit``) lifts batches of views on-chip and
writes the exact HDF5 schema ``data/mp3d.py`` (and the reference's own
loader) reads.

Image sources (--images):
  * a directory — files named ``{scan}_{vp}_i{cam}_{deg}.{jpg,png,npy}``
    (npy: (H, W, 3) uint8), searched recursively;
  * an HDF5 file — uint8 image datasets under the same keys;
  * ``synthetic:N`` — N fabricated viewpoints x 6 views (smoke/bench).

Weights (--checkpoint): a torch state dict in HuggingFace ``ViTModel``
layout (``vit.``-prefixed classification checkpoints accepted), converted
function-preservingly; omit for random init (pipeline smoke only).

Usage:
  python tools/extract_vit_features.py --images views/ \
      --checkpoint vit_base_patch16_224.pth \
      --out new_vit_base_patch16_197_imagenet.hdf5
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KEY_RE = re.compile(r"^(?P<key>.+_i\d+_\d+)\.(jpg|jpeg|png|npy)$", re.I)


def iter_dir_images(root):
    """Yield (key, path) for every image under ``root``.  Keys come from
    basenames, so a pre-scan rejects collisions (same basename in two
    subdirectories, or x.jpg next to x.npy) up front — h5py would
    otherwise die on the duplicate create_dataset hours into a run."""
    by_key = {}
    for dirpath, _, names in sorted(os.walk(root)):
        for name in sorted(names):
            m = KEY_RE.match(name)
            if not m:
                continue
            key, path = m.group("key"), os.path.join(dirpath, name)
            if key in by_key:
                raise SystemExit(
                    f"duplicate feature key '{key}': {by_key[key]} "
                    f"and {path} — de-duplicate the image tree first")
            by_key[key] = path
    yield from by_key.items()


def load_image(path) -> np.ndarray:
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - env has PIL
            raise SystemExit(
                f"PIL unavailable for {path}; use .npy images") from e
        img = np.asarray(Image.open(path).convert("RGB"))
    assert img.ndim == 3 and img.shape[2] == 3, (path, img.shape)
    return img.astype(np.uint8)


def iter_images(spec, image_hw):
    """Yield (key, (H, W, 3) uint8) pairs from a directory / HDF5 /
    synthetic spec.  All images must share one shape (static jit shape)."""
    if spec.startswith("synthetic:"):
        n = int(spec.split(":", 1)[1])
        rng = np.random.RandomState(0)
        for v in range(n):
            for deg in range(6):
                yield (f"scan{v:03d}_vp{v:03d}_i1_{deg}",
                       rng.randint(0, 256, (*image_hw, 3), np.uint8))
    elif os.path.isdir(spec):
        for key, path in iter_dir_images(spec):
            yield key, load_image(path)
    else:
        import h5py
        with h5py.File(spec, "r") as f:
            for key in sorted(f.keys()):
                yield key, np.asarray(f[key], np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True,
                    help="image dir | images HDF5 | synthetic:N")
    ap.add_argument("--out", required=True, help="output feature HDF5")
    ap.add_argument("--checkpoint", default=None,
                    help="HF ViTModel torch state dict (.pth/.bin)")
    ap.add_argument("--hf-prefix", default="",
                    help="state-dict key prefix (e.g. 'vit.')")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--embed-dims", type=int, default=768)
    ap.add_argument("--num-layers", type=int, default=12)
    ap.add_argument("--num-heads", type=int, default=12)
    ap.add_argument("--ffn-dim", type=int, default=3072)
    ap.add_argument("--mean", type=float, default=0.5,
                    help="normalisation mean (timm/HF ViT-B/16: 0.5)")
    ap.add_argument("--std", type=float, default=0.5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (fp32 params + outputs)")
    ap.add_argument("--store-dtype", default="float32",
                    choices=["float32", "float16"])
    ap.add_argument("--input-hw", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="raw image shape fed to the jitted program "
                         "(default: resize host-side to image-size)")
    args = ap.parse_args(argv)

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from vln_ver_tpu.models.vit import (ViT, convert_hf_vit_params,
                                        preprocess_images)

    model = ViT(image_size=args.image_size, patch_size=args.patch_size,
                embed_dims=args.embed_dims, num_layers=args.num_layers,
                num_heads=args.num_heads, ffn_dim=args.ffn_dim,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    in_hw = tuple(args.input_hw) if args.input_hw else (args.image_size,
                                                        args.image_size)
    if args.checkpoint:
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        variables = convert_hf_vit_params(sd, args.num_layers,
                                          args.num_heads,
                                          prefix=args.hf_prefix)
    else:
        print("[extract_vit] no --checkpoint: RANDOM weights (smoke only)")
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)))

    # params must be a jit ARGUMENT: closing over the ~86M-param tree
    # bakes ~344 MB of constants into the HLO, which the axon tunnel's
    # compile endpoint rejects (HTTP 413 — same failure fixed in
    # tools/serve_ver.py and tools/probe_upload_quant.py)
    @jax.jit
    def forward(params, images_u8):
        x = preprocess_images(images_u8, args.image_size, args.mean,
                              args.std)
        return model.apply(params, x)

    import h5py
    store_dtype = np.dtype(args.store_dtype)
    keys, buf = [], []
    n_done = 0

    def flush(fout):
        nonlocal n_done
        if not keys:
            return
        batch = np.stack(buf)
        pad = args.batch - len(keys)
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
        feats = np.asarray(jax.device_get(forward(variables, batch)))[:len(keys)]
        for k, ft in zip(keys, feats):
            fout.create_dataset(k, data=ft[None].astype(store_dtype),
                                compression="gzip")
        n_done += len(keys)
        keys.clear()
        buf.clear()

    with h5py.File(args.out, "w") as fout:
        for key, img in iter_images(args.images, in_hw):
            if img.shape[:2] != in_hw:
                # host-side nearest pre-crop to the static jit shape
                ys = (np.arange(in_hw[0]) * img.shape[0] // in_hw[0])
                xs = (np.arange(in_hw[1]) * img.shape[1] // in_hw[1])
                img = img[ys][:, xs]
            keys.append(key)
            buf.append(img)
            if len(keys) == args.batch:
                flush(fout)
        flush(fout)
    print(f"[extract_vit] wrote {n_done} views -> {args.out} "
          f"(tokens 1+{model.num_patches}, dim {args.embed_dims})")


if __name__ == "__main__":
    main()
