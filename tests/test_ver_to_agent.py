"""Integration: the VER product path feeds the VLN agent.

Synthetic MP3D data -> VoxelFormer only_bev volumes (the tools/get_occ
artifact) -> VERTokenizer/policy step.  Exercises the full hand-off the
north star describes (perception dumps VER; agent consumes it)."""

import jax
import jax.numpy as jnp
import numpy as np

from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
from vln_ver_tpu.models import VERConfig, VoxelFormer

CFG = VERConfig(
    bev_z=2, bev_h=4, bev_w=4,
    occupancy_size=(1.5, 1.5, 0.4375),
    num_cams=2, feat_h=4, feat_w=4, in_channels=32,
    embed_dims=32, num_heads=4, encoder_layers=1, decoder_layers=1,
    ffn_dim=64, num_query=8, occ_dims=16,
)


def test_ver_volume_feeds_policy(tmp_path):
    ann = make_synthetic_dataset(
        str(tmp_path), num_scans=1, viewpoints_per_scan=2,
        num_cams=CFG.num_cams, feat_hw=CFG.feat_h,
        feat_dim=CFG.in_channels,
        occ_dims=(CFG.occ_zdim, CFG.occ_ydim, CFG.occ_xdim),
        pc_range=CFG.pc_range)
    ds = MP3DDataset(ann, str(tmp_path), voxel_num=CFG.voxel_num,
                     occupancy_classes=CFG.occupancy_classes,
                     num_cams=CFG.num_cams, feat_hw=CFG.feat_h)
    model = VoxelFormer(CFG)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    volume = model.apply(params, s["features"][None],
                         s["world2pixel"][None], s["origin_shift"][None],
                         only_bev=True)["bev_embed"]
    assert volume.shape == (1, CFG.bev_num, CFG.embed_dims)

    pcfg = PolicyConfig(embed_dims=CFG.embed_dims, num_heads=4,
                        fusion_layers=1, text_layers=1, ffn_dim=64,
                        vocab_size=64, max_text_len=8, max_nodes=6,
                        bev_z=CFG.bev_z, bev_h=CFG.bev_h, bev_w=CFG.bev_w,
                        num_query_tokens=2)
    policy = VLNPolicy(pcfg)
    tokens = jnp.asarray(np.array([[3, 5, 9, 0, 0, 0, 0, 0]], np.int32))
    mem = init_memory(1, pcfg.max_nodes, pcfg.embed_dims)
    pparams = policy.init(jax.random.PRNGKey(1), tokens, tokens > 0,
                          volume, mem, jnp.zeros((1, 3)),
                          jnp.zeros((1,), jnp.int32))
    out = policy.apply(pparams, tokens, tokens > 0, volume, mem,
                       jnp.zeros((1, 3)), jnp.zeros((1,), jnp.int32))
    assert out.logits.shape == (1, 1 + pcfg.max_nodes)
    assert np.isfinite(np.asarray(out.logits[:, 0])).all()
    assert np.isfinite(np.asarray(out.state_pred)).all()
