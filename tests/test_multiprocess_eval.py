"""Genuine multi-process eval test: 2 jax.distributed CPU processes with
sharded eval must produce metrics identical to a single-process run.

Exercises the whole multi-host path for real (jax.distributed bring-up,
shard_indices block split, allgather_results padding, allreduce_sum of the
SSC histograms) — the reference's custom_multi_gpu_test + result collection
(apis/test.py:202-246) and DistributedSampler (:36-39) semantics.
"""

import dataclasses
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests.test_model_forward import TINY
from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
from vln_ver_tpu.evaluation.runner import evaluate_model
from vln_ver_tpu.models import VoxelFormer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_eval_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_eval_matches_single_process(tmp_path):
    cfg = TINY
    # 5 viewpoints with 2 processes -> per=3, proc1 gets the short tail:
    # exercises uneven shards and result padding
    ann = make_synthetic_dataset(
        str(tmp_path), num_scans=1, viewpoints_per_scan=5,
        num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
        feat_dim=cfg.in_channels,
        occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
        pc_range=cfg.pc_range)

    # single-process reference metrics (in this pytest process)
    ds = MP3DDataset(ann, str(tmp_path), voxel_num=cfg.voxel_num,
                     occupancy_classes=cfg.occupancy_classes,
                     num_cams=cfg.num_cams, feat_hw=cfg.feat_h)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    single = evaluate_model(model, params, ds, shard=False)
    single_l1 = evaluate_model(model, params, ds, shard=False, limit=1)

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out_json = str(tmp_path / f"metrics_{pid}.json")
        outs.append(out_json)
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, ann, out_json],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out.decode()[-4000:]

    for out_json in outs:
        with open(out_json) as f:
            payload = json.load(f)
        for sharded, ref in ((payload["full"], single),
                             (payload["limit1"], single_l1)):
            assert set(sharded) == set(ref)
            for k, v in ref.items():
                np.testing.assert_allclose(sharded[k], float(v),
                                           rtol=1e-6, atol=1e-8,
                                           err_msg=k)
