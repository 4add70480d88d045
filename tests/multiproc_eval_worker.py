"""Worker process for the 2-process sharded-eval test.

Run as a subprocess with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set by the parent (tests/test_multiprocess_eval.py).
Evaluates the tiny model over a pre-built synthetic dataset with sharded
eval and writes the metrics dict as JSON.

Usage: python multiproc_eval_worker.py <dataset_dir> <out_json>
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=1").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))) + "/tests")

from vln_ver_tpu.parallel.multihost import initialize_if_needed  # noqa

initialize_if_needed()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ann, out_json = sys.argv[1], sys.argv[2]
    root = os.path.dirname(ann)
    from test_model_forward import TINY as cfg

    from vln_ver_tpu.data import MP3DDataset
    from vln_ver_tpu.evaluation.runner import evaluate_model
    from vln_ver_tpu.models import VoxelFormer

    ds = MP3DDataset(ann, root, voxel_num=cfg.voxel_num,
                     occupancy_classes=cfg.occupancy_classes,
                     num_cams=cfg.num_cams, feat_hw=cfg.feat_h)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    metrics = evaluate_model(model, params, ds, shard=True)
    # limit=1 on 2 processes -> per=1 and process 1's shard is EMPTY:
    # exercises the dtype/shape handshake that lets empty shards
    # participate in the result allgather (a legal case with contiguous
    # ceil-division shards; used to raise/deadlock)
    limit1 = evaluate_model(model, params, ds, shard=True, limit=1)
    with open(out_json, "w") as f:
        json.dump({"full": {k: float(v) for k, v in metrics.items()},
                   "limit1": {k: float(v) for k, v in limit1.items()}}, f)
    print(f"proc {jax.process_index()}/{jax.process_count()} ok")


if __name__ == "__main__":
    main()
