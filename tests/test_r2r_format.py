"""R2R on-disk format round-trip: write standard R2R_{split}.json +
connectivity jsons, load through agent.data, run an episode."""

import json
import os

import numpy as np

from vln_ver_tpu.agent.data import (Vocab, load_graphs, load_r2r_split,
                                    tokenize)
from vln_ver_tpu.agent.env import R2REnv


def _write_r2r(root):
    os.makedirs(os.path.join(root, "connectivity"), exist_ok=True)
    # 4-node line graph
    nodes = []
    for i in range(4):
        pose = np.eye(4)
        pose[:3, 3] = [i * 2.0, 0, 0]
        unobstructed = [abs(j - i) == 1 for j in range(4)]
        nodes.append(dict(image_id=f"vp{i}", pose=pose.reshape(-1).tolist(),
                          unobstructed=unobstructed, included=True))
    with open(os.path.join(root, "connectivity",
                           "scanA_connectivity.json"), "w") as f:
        json.dump(nodes, f)
    items = [dict(scan="scanA", path=["vp0", "vp1", "vp2"], heading=0.0,
                  instructions=["walk to the second room",
                                "go forward twice",
                                "move ahead and stop"])]
    with open(os.path.join(root, "R2R_train.json"), "w") as f:
        json.dump(items, f)


def test_tokenizer_and_vocab():
    v = Vocab.build(["go to the red chair", "go to the blue chair"],
                    min_count=1)
    ids = v.encode("go to the GREEN chair", 8)
    assert ids.shape == (8,)
    assert ids[0] == v.stoi["go"]
    assert ids[3] == 1  # unk for 'green'
    assert ids[-1] == 0  # pad
    assert tokenize("Turn left, then stop.") == [
        "turn", "left", ",", "then", "stop", "."]


def test_r2r_roundtrip_and_episode(tmp_path):
    root = str(tmp_path)
    _write_r2r(root)
    episodes, vocab = load_r2r_split(root, "train", None, max_text_len=12)
    assert len(episodes) == 3  # one per instruction
    graphs = load_graphs(os.path.join(root, "connectivity"),
                         [e["scan"] for e in episodes])
    g = graphs["scanA"]
    assert g.distance("vp0", "vp1") == 2.0
    assert g.shortest_paths("vp0")["vp2"][0] == 4.0
    # VER features keyed '{scan}_{vp}'
    ver = {f"scanA_vp{i}": np.zeros((8, 4), np.float32) for i in range(4)}
    env = R2REnv(episodes, graphs, ver, max_nodes=8)
    state = env.reset(0)
    while not state["done"]:
        env.step(state, env.teacher_action(state))
    m = env.metrics(state)
    assert m["success"] == 1.0 and m["nav_error"] == 0.0