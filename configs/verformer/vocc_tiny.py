# Tiny VER config for CPU smoke runs / CI: same structure as vocc.py with
# all dims shrunk (bev 2x4x4, occ 8x8x8, 2 cams, embed 32).
_base_ = ['./vocc.py']

point_cloud_range = [-6.0, -6.0, -1.5, 6.0, 6.0, 2.0]

model = dict(pts_bbox_head=dict(
    bev_z=2, bev_h=4, bev_w=4,
    occupancy_size=[1.5, 1.5, 0.4375],
    num_query=12,
    occ_dims=16,
    transformer=dict(
        embed_dims=32,
        encoder=dict(
            num_layers=1,
            transformerlayers=dict(
                feedforward_channels=64,
                attn_cfgs=[dict(
                    type='SpatialCrossAttention',
                    deformable_attention=dict(
                        type='MSDeformableAttention3D',
                        embed_dims=32, num_points=8, num_levels=1),
                    embed_dims=32)])),
        decoder=dict(num_layers=2))))

# tiny input shapes
num_cams = 2
feat_h = 4
feat_w = 4
in_channels = 32

# tiny synthetic data roots
data = dict(
    train=dict(data_root='data/tiny', ann_file='data/tiny/mp3d_trainval.pkl'),
    val=dict(data_root='data/tiny', ann_file='data/tiny/mp3d_test.pkl'),
    test=dict(data_root='data/tiny', ann_file='data/tiny/mp3d_test.pkl'))

total_epochs = 2
runner = dict(max_epochs=2)
lr_config = dict(warmup_iters=1, warmup_by_epoch=False)
