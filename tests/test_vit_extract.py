"""ViT feature extraction: HF ViTModel conversion parity + the extractor
CLI's HDF5 contract.

The reference consumes ``new_vit_base_patch16_197_imagenet.hdf5``
(voxelformer.py:317-325) but ships no extractor; ours must (a) reproduce a
HuggingFace ``ViTModel`` function-preservingly so ImageNet-pretrained
weights carry over, and (b) write the exact key/shape schema
``data/mp3d.py`` reads.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vln_ver_tpu.models.vit import ViT, convert_hf_vit_params

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _tiny_vit(seed=0):
    cfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    model = transformers.ViTModel(cfg, add_pooling_layer=False)
    model.eval()
    return cfg, model


def test_vit_conversion_matches_torch():
    cfg, model = _tiny_vit()
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3),
                               ).astype(np.float32)

    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(
            imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    vit = ViT(image_size=cfg.image_size, patch_size=cfg.patch_size,
              embed_dims=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
              num_heads=cfg.num_attention_heads,
              ffn_dim=cfg.intermediate_size)
    params = convert_hf_vit_params(model.state_dict(),
                                   num_layers=cfg.num_hidden_layers,
                                   num_heads=cfg.num_attention_heads)
    import jax.numpy as jnp
    out = np.asarray(vit.apply(params, jnp.asarray(imgs)))
    assert out.shape == ref.shape == (2, 1 + (32 // 8) ** 2, 32)
    assert np.abs(out - ref).max() < 2e-5


def test_vit_conversion_accepts_prefix_and_torch_tensors():
    cfg, model = _tiny_vit(seed=1)
    sd = {"vit." + k: v for k, v in model.state_dict().items()}
    params = convert_hf_vit_params(sd, num_layers=cfg.num_hidden_layers,
                                   num_heads=cfg.num_attention_heads,
                                   prefix="vit.")
    assert params["params"]["cls_token"].shape == (1, 1, cfg.hidden_size)


def test_extract_cli_writes_reference_schema(tmp_path):
    import extract_vit_features as cli

    out = str(tmp_path / "feats.hdf5")
    cli.main(["--images", "synthetic:2", "--out", out,
              "--image-size", "32", "--patch-size", "8",
              "--embed-dims", "16", "--num-layers", "1",
              "--num-heads", "2", "--ffn-dim", "32",
              "--batch", "5", "--input-hw", "48", "40"])

    import h5py
    with h5py.File(out, "r") as f:
        keys = sorted(f.keys())
        # 2 viewpoints x 6 views, reference key grammar {scan}_{vp}_i1_{deg}
        assert len(keys) == 12 and keys[0] == "scan000_vp000_i1_0"
        ft = f["scan000_vp000_i1_3"][:]
        # (1, 1 + P, C) with CLS at row 0 — strippable via [:, 1:, :]
        assert ft.shape == (1, 1 + (32 // 8) ** 2, 16)
        assert ft.dtype == np.float32
        patch = ft[:, 1:, :]
        assert patch.shape == (1, 16, 16)
        assert np.isfinite(ft).all() and np.abs(ft).max() > 0


def test_extract_cli_dir_npy_and_determinism(tmp_path):
    import extract_vit_features as cli

    imgdir = tmp_path / "views"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for deg in range(3):
        np.save(imgdir / f"sA_vB_i1_{deg}.npy",
                rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
    args = ["--out", None, "--image-size", "32", "--patch-size", "8",
            "--embed-dims", "16", "--num-layers", "1", "--num-heads", "2",
            "--ffn-dim", "32", "--batch", "2"]
    outs = []
    import h5py
    for name in ("a.hdf5", "b.hdf5"):
        out = str(tmp_path / name)
        args[1] = out
        cli.main(["--images", str(imgdir)] + args)
        with h5py.File(out, "r") as f:
            assert sorted(f.keys()) == [f"sA_vB_i1_{d}" for d in range(3)]
            outs.append(np.stack([f[k][:] for k in sorted(f.keys())]))
    # same weights (seeded init) + same images -> bitwise identical store
    assert (outs[0] == outs[1]).all()
