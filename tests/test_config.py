import os

from vln_ver_tpu.config import (build_train_config, build_ver_config,
                                load_config)

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs", "verformer")


def test_load_vocc_config():
    cfg = load_config(os.path.join(CONFIGS, "vocc.py"))
    ver = build_ver_config(cfg)
    assert ver.bev_z == 4 and ver.bev_h == 15 and ver.bev_w == 15
    assert ver.embed_dims == 768
    assert ver.encoder_layers == 3 and ver.decoder_layers == 6
    assert ver.num_query == 100 and ver.num_classes == 17
    assert ver.occupancy_classes == 16 and ver.occ_dims == 128
    assert ver.sca_num_points == 8
    assert ver.refine_occ and not ver.only_occ and not ver.only_det
    assert ver.occ_zdim == 35 and ver.occ_xdim == 120
    assert ver.ffn_dim == 1536


def test_get_occ_inherits_base():
    cfg = load_config(os.path.join(CONFIGS, "get_occ.py"))
    # override applied
    assert cfg["savename"] == "work_dirs/voxel_grid15.hdf5"
    assert cfg["model"]["pts_bbox_head"]["getbev"] == cfg["savename"]
    # base preserved through the recursive merge
    assert cfg["model"]["pts_bbox_head"]["bev_h"] == 15
    assert cfg["data"]["test"]["ann_file"].endswith("mp3d_forall.pkl")
    assert cfg["data"]["train"]["ann_file"].endswith("mp3d_trainval.pkl")


def test_train_config_mapping():
    cfg = load_config(os.path.join(CONFIGS, "vocc.py"))
    tc = build_train_config(cfg, steps_per_epoch=100)
    assert tc.learning_rate == 1e-4
    assert tc.grad_clip_norm == 300
    assert tc.warmup_steps == 30 * 100      # warmup_by_epoch
    assert tc.total_steps == 500 * 100
    assert tc.min_lr_ratio == 1e-3


def test_reference_config_loads_unchanged():
    """The actual reference config file must load through our front-end."""
    ref = "/root/reference/projects/configs/verformer/vocc.py"
    if not os.path.exists(ref):
        return
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # missing _base_ files
        cfg = load_config(ref)
    ver = build_ver_config(cfg)
    assert ver.bev_num == 900
    assert ver.voxel_num == 504000
    assert ver.embed_dims == 768


def test_nested_attribute_assignment_sticks():
    """cfg.a.b.c = v (the mmcv-style nested mutation the attribute API
    invites) must mutate the config — regression: __getattr__ returned a
    fresh copy per access and the override silently vanished."""
    from vln_ver_tpu.config.api import Config

    cfg = Config(model=dict(pts_bbox_head=dict(only_occ=False)))
    cfg.model.pts_bbox_head.only_occ = True
    assert cfg["model"]["pts_bbox_head"]["only_occ"] is True
    assert cfg.model.pts_bbox_head.only_occ is True
