import os

from vln_ver_tpu.config import build_ver_config, load_config
from vln_ver_tpu.config.api import apply_cfg_options

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "verformer")


def test_cfg_options_override():
    cfg = load_config(os.path.join(CONFIGS, "vocc.py"))
    cfg = apply_cfg_options(cfg, [
        "model.pts_bbox_head.num_query=64",
        "optimizer.lr=0.0005",
        "total_epochs=7",
        "model.pts_bbox_head.only_det=True",
    ])
    assert cfg["model"]["pts_bbox_head"]["num_query"] == 64
    assert cfg["optimizer"]["lr"] == 0.0005
    assert cfg["total_epochs"] == 7
    ver = build_ver_config(cfg)
    assert ver.num_query == 64 and ver.only_det is True


def test_cfg_options_string_value():
    cfg = load_config(os.path.join(CONFIGS, "vocc.py"))
    cfg = apply_cfg_options(cfg, ["savename=out/x.hdf5"])
    assert cfg["savename"] == "out/x.hdf5"


def test_merge_consumes_delete_marker_without_base_key():
    """mmcv semantics: `_delete_` is ALWAYS consumed — it must not leak
    into the merged config when the base lacks the key (the documented
    situation when the reference's missing _base_ file is skipped), and
    the caller's override dict must not be mutated."""
    from vln_ver_tpu.config.api import _merge
    override = {"lr_config": {"_delete_": True, "policy": "step"}}
    merged = _merge({}, override)
    assert merged["lr_config"] == {"policy": "step"}
    assert override["lr_config"]["_delete_"] is True  # caller untouched

    merged2 = _merge({"lr_config": {"policy": "cos", "min_lr": 1}},
                     {"lr_config": {"_delete_": True, "policy": "step"}})
    assert merged2["lr_config"] == {"policy": "step"}  # replaced, no merge
    merged3 = _merge({"lr_config": "notadict"},
                     {"lr_config": {"_delete_": True, "policy": "step"}})
    assert merged3["lr_config"] == {"policy": "step"}
