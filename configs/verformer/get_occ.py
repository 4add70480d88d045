# VER volume generation config: identical to vocc.py except the VER dump
# target (reference get_occ.py differs from vocc.py only in `savename` and
# the test annotation file — SURVEY.md §1 L8).
_base_ = ['./vocc.py']

savename = 'work_dirs/voxel_grid15.hdf5'
test_ann_filename = 'data/mp3d/mp3d_forall.pkl'

model = dict(pts_bbox_head=dict(getbev=savename))
data = dict(test=dict(ann_file=test_ann_filename))
