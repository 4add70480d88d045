"""R2R-format episode environment (host-side graph stepping).

Loads the standard R2R data layout — ``{split}.json`` instruction episodes
({scan, path, heading, instructions}) + per-scan connectivity graphs — and
steps an agent over the navigation graph.  Per-viewpoint VER features come
from the HDF5 produced by tools/get_occ.py (key = '{scan}_{viewpoint}').

Matterport data is licence-gated, so a synthetic generator builds the
same structures in memory (graphs + episodes + VER features) for tests
and rehearsal.

The environment exposes static-shape observations keyed by stable node
slots (viewpoint -> slot id assigned on first discovery, capacity
``max_nodes``) so the jitted policy/rollout never sees dynamic shapes.
DUET-style action semantics: choosing a memory node teleports the agent
along the known graph (shortest path over discovered edges); choosing slot
-1/stop ends the episode.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


class NavGraph:
    def __init__(self, positions: Dict[str, np.ndarray],
                 edges: Dict[str, List[str]]):
        self.positions = positions
        self.edges = edges

    def distance(self, a: str, b: str) -> float:
        return float(np.linalg.norm(self.positions[a] - self.positions[b]))

    def shortest_paths(self, src: str) -> Dict[str, Tuple[float, str]]:
        """Dijkstra: node -> (distance, first hop from src)."""
        dist, first, _ = self._dijkstra(src)
        return {k: (dist[k], first[k]) for k in dist}

    def _dijkstra(self, src: str, allowed=None):
        """Returns (dist, first-hop, predecessor) maps from ``src``;
        ``allowed`` (a node set) restricts the search to that subgraph."""
        import heapq
        dist = {src: 0.0}
        first = {src: src}
        prev = {src: src}
        heap = [(0.0, src)]
        seen = set()
        while heap:
            d, u = heapq.heappop(heap)
            if u in seen:
                continue
            seen.add(u)
            for v in self.edges[u]:
                if allowed is not None and v not in allowed:
                    continue
                nd = d + self.distance(u, v)
                if v not in dist or nd < dist[v] - 1e-9:
                    dist[v] = nd
                    first[v] = v if u == src else first[u]
                    prev[v] = u
                    heapq.heappush(heap, (nd, v))
        return dist, first, prev

    def path(self, src: str, dst: str, allowed=None):
        """Full shortest path [src..dst] (one Dijkstra, reconstructed
        from the predecessor map), or None if unreachable; ``allowed``
        restricts the walk to that node set."""
        dist, _, prev = self._dijkstra(src, allowed)
        if dst not in dist:
            return None
        hops = [dst]
        while hops[-1] != src:
            hops.append(prev[hops[-1]])
        return hops[::-1]


def load_connectivity(path: str) -> NavGraph:
    """Parse a Matterport connectivity json (list of nodes with
    'image_id', 'pose' 4x4 row-major, 'unobstructed' adjacency bools,
    'included')."""
    with open(path) as f:
        data = json.load(f)
    ids = [d["image_id"] for d in data]
    positions, edges = {}, {}
    for i, d in enumerate(data):
        if not d.get("included", True):
            continue
        pose = np.asarray(d["pose"], dtype=np.float32).reshape(4, 4)
        positions[ids[i]] = pose[:3, 3]
        adj = []
        for j, ok in enumerate(d["unobstructed"]):
            if ok and data[j].get("included", True):
                adj.append(ids[j])
        edges[ids[i]] = adj
    return NavGraph(positions, edges)


class R2REnv:
    """Batch-1-per-episode environment over precomputed VER volumes."""

    def __init__(self, episodes: List[Dict], graphs: Dict[str, NavGraph],
                 ver_features: Dict[str, np.ndarray],
                 max_nodes: int = 32, success_radius: float = 3.0,
                 objects: Optional[Dict[str, Dict]] = None,
                 max_objects: int = 8):
        """``objects`` (REVERIE): token -> {"ids": [objId, ...],
        "feats": (N, C) float32} candidate objects per viewpoint."""
        self.episodes = episodes
        self.graphs = graphs
        self.ver = ver_features
        self.max_nodes = max_nodes
        self.success_radius = success_radius
        self.objects = objects
        self.max_objects = max_objects

    # -- helpers -------------------------------------------------------
    def _slot(self, state, vp: str) -> int:
        # "seen" is the agent's PHYSICAL knowledge of the scan — every
        # node ever discovered, never evicted (slot recycling frees
        # memory slots, not knowledge); step() walks teleports over
        # this subgraph only, honoring the discovered-edges semantics
        state["seen"].add(vp)
        if vp not in state["slot_of"]:
            idx = len(state["slot_of"])
            if idx >= self.max_nodes:
                # Recycle in discovery (FIFO) order, but never steal the
                # slot of the current node or of any neighbour of it (the
                # frontier the policy must still be able to pick), and
                # evict the old occupant from slot_of so a slot id always
                # maps to exactly one viewpoint.
                protected = {state["cur"]}
                protected.update(state["graph"].edges[state["cur"]])
                idx = None
                ptr = state.get("recycle_ptr", 0)
                for off in range(self.max_nodes):
                    cand = (ptr + off) % self.max_nodes
                    if state["vp_of"].get(cand) not in protected:
                        idx = cand
                        state["recycle_ptr"] = (cand + 1) % self.max_nodes
                        break
                if idx is None:
                    raise RuntimeError(
                        "R2REnv memory overflow: every slot is protected; "
                        "raise max_nodes (current node has too many "
                        "neighbours for max_nodes=%d)" % self.max_nodes)
                old = state["vp_of"].get(idx)
                if old is not None:
                    del state["slot_of"][old]
            state["slot_of"][vp] = idx
            state["vp_of"][idx] = vp
        return state["slot_of"][vp]

    def reset(self, ep_idx: int) -> Dict:
        ep = self.episodes[ep_idx]
        graph = self.graphs[ep["scan"]]
        start = ep["path"][0]
        goal = ep["path"][-1]
        state = dict(ep=ep, graph=graph, cur=start, goal=goal,
                     slot_of={}, vp_of={}, steps=0, traj=[start],
                     length=0.0, done=False, seen={start},
                     # decision-visited: nodes the policy has STOOD at
                     # (start + every chosen target); walk-through hops
                     # on multi-hop teleports are in traj but NOT here
                     visited_dec={start})
        self._discover(state)
        return state

    def _discover(self, state) -> None:
        """Register current node + its neighbours into memory slots."""
        self._slot(state, state["cur"])
        for nb in state["graph"].edges[state["cur"]]:
            self._slot(state, nb)

    def observe(self, state) -> Dict[str, np.ndarray]:
        """Static-shape observation for the policy + memory update info."""
        ep = state["ep"]
        graph = state["graph"]
        cur = state["cur"]
        token = f"{ep['scan']}_{cur}"
        volume = self.ver[token]
        # node positions/validity live in memory_arrays (the episodic
        # memory is the single source of truth); duplicating them here
        # was dead per-step host->device payload
        obs = dict(
            volume=volume.astype(np.float32),
            cur_pos=graph.positions[cur].astype(np.float32),
            cur_slot=np.int32(state["slot_of"][cur]),
            instruction=ep["instruction_tokens"],
        )
        if self.objects is not None:
            c = next(iter(self.ver.values())).shape[-1]
            feats = np.zeros((self.max_objects, c), np.float32)
            valid = np.zeros((self.max_objects,), bool)
            entry = self.objects.get(token)
            if entry is not None:
                k = min(len(entry["ids"]), self.max_objects)
                feats[:k] = entry["feats"][:k]
                valid[:k] = True
            obs["obj_feats"] = feats
            obs["obj_valid"] = valid
            # teacher grounding label: index of the episode's objId among
            # this viewpoint's candidates, -1 if absent
            gt = -1
            obj_id = ep.get("objId")
            if obj_id is not None and entry is not None:
                ids = list(entry["ids"])[:self.max_objects]
                if obj_id in ids:
                    gt = ids.index(obj_id)
            obs["gt_obj"] = np.int32(gt)
        return obs

    def _pooled_feature(self, token: str) -> np.ndarray:
        """Voxel-pooled VER feature for a viewpoint (cached — it is a pure
        function of the token)."""
        cache = getattr(self, "_pooled_cache", None)
        if cache is None:
            cache = self._pooled_cache = {}
        f = cache.get(token)
        if f is None:
            f = cache[token] = self.ver[token].astype(
                np.float32).mean(axis=0)
        return f

    def memory_arrays(self, state) -> Dict[str, np.ndarray]:
        """Episodic-memory content implied by the CURRENT env state: the
        single source of truth for rollouts/pretraining.

        Rebuilding from state (rather than incrementally patching a
        device-side memory) is what makes slot RECYCLING correct: when
        ``_slot`` evicts a viewpoint, its slot simply describes the new
        occupant here — an incremental path would need an invalidation
        protocol (and an earlier version silently kept the evicted
        node's feature/position/visited flag).  It also turns the
        per-discovered-node device writes into one host build + one
        transfer per step, which matters on the high-RTT axon backend.

        Visited nodes carry their voxel-pooled VER feature; frontier
        (discovered, unvisited) nodes are position-only, as in DUET's
        global map.
        """
        n = self.max_nodes
        c = next(iter(self.ver.values())).shape[-1]
        feats = np.zeros((n, c), np.float32)
        pos = np.zeros((n, 3), np.float32)
        valid = np.zeros((n,), bool)
        visited = np.zeros((n,), bool)
        graph = state["graph"]
        scan = state["ep"]["scan"]
        for vp, s in state["slot_of"].items():
            valid[s] = True
            pos[s] = graph.positions[vp]
            if vp in state["visited_dec"]:
                visited[s] = True
                feats[s] = self._pooled_feature(f"{scan}_{vp}")
        return dict(features=feats, positions=pos, valid=valid,
                    visited=visited)

    def teacher_action(self, state) -> int:
        """0 = stop, 1+slot = go to that node: the discovered node that
        most reduces shortest-path distance to the goal."""
        graph = state["graph"]
        cur, goal = state["cur"], state["goal"]
        # Teacher stops exactly at the goal node (R2R teachers follow the
        # annotated path to its end; success_radius is an *evaluation*
        # notion, not a teacher early-stop).
        if cur == goal:
            return 0
        sp = graph.shortest_paths(cur)
        if goal not in sp:
            return 0
        if sp[goal][0] < 1e-6:
            return 0
        # best discovered node = next hop on the shortest path
        nxt = sp[goal][1]
        return 1 + state["slot_of"][nxt]

    def step(self, state, action: int) -> None:
        """action 0 = stop; else teleport along the graph to slot-1."""
        state["steps"] += 1
        if action == 0 or state["steps"] > 2 * self.max_nodes:
            state["done"] = True
            return
        target = state["vp_of"].get(action - 1)
        if target is None or target == state["cur"]:
            state["done"] = True
            return
        graph = state["graph"]
        # teleport along the DISCOVERED subgraph only (module docstring;
        # DUET's topological-map semantics): routing over the full scan
        # would cut through never-seen viewpoints, under-counting
        # traj_length and inflating SPL/CLS/nDTW.  The discovered set is
        # connected by construction (every node enters "seen" as a
        # neighbour of a stood-at node), so a discovered target is
        # always reachable.  ONE Dijkstra per teleport — the full path
        # comes from the predecessor map, not a per-hop re-solve.
        hops = graph.path(state["cur"], target, allowed=state["seen"])
        if hops is None:
            state["done"] = True
            return
        for prev_vp, hop in zip(hops[:-1], hops[1:]):
            state["length"] += graph.distance(prev_vp, hop)
            state["traj"].append(hop)
        state["cur"] = target
        state["visited_dec"].add(target)
        self._discover(state)

    def metrics(self, state) -> Dict[str, float]:
        graph = state["graph"]
        ep = state["ep"]
        err = graph.distance(state["cur"], state["goal"])
        success = float(err < self.success_radius)
        gt_len = 0.0
        for a, b in zip(ep["path"][:-1], ep["path"][1:]):
            gt_len += graph.distance(a, b)
        # SPL's l is the SHORTEST-path length start->goal (Anderson et
        # al. 2018), NOT the annotated path length: on R4R the annotated
        # paths are deliberately non-shortest, so gt_len would overstate
        # the numerator.  gt_len stays the reference length for CLS.
        sp0 = graph.shortest_paths(ep["path"][0])
        short = sp0.get(state["goal"], (gt_len,))[0]
        spl = success * short / max(state["length"], short, 1e-6)
        oracle = min(
            graph.distance(v, state["goal"]) for v in state["traj"])
        traj = np.stack([graph.positions[v] for v in state["traj"]])
        ref = np.stack([graph.positions[v] for v in ep["path"]])
        ndtw = self._ndtw(traj, ref)
        out = dict(nav_error=err, success=success, spl=spl,
                   oracle_success=float(oracle < self.success_radius),
                   traj_length=state["length"],
                   ndtw=ndtw, sdtw=success * ndtw,
                   cls=self._cls(traj, ref, state["length"], gt_len))
        if ep.get("objId") is not None and self.objects is not None:
            # REVERIE remote grounding: correct object picked at a
            # successful stop; RGSPL length-weights it like SPL
            rgs = success * float(
                state.get("pred_obj_id") == ep["objId"])
            out["rgs"] = rgs
            out["rgspl"] = rgs * short / max(state["length"], short, 1e-6)
        return out

    # -- path-fidelity metrics (R4R headline numbers) -------------------
    def _ndtw(self, traj: np.ndarray, ref: np.ndarray) -> float:
        """Normalised dynamic time warping (Ilharco et al. 2019):
        exp(-DTW(traj, ref) / (|ref| * d_th))."""
        n, m = len(traj), len(ref)
        d = np.linalg.norm(traj[:, None, :] - ref[None, :, :], axis=-1)
        acc = np.full((n + 1, m + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                acc[i, j] = d[i - 1, j - 1] + min(
                    acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
        return float(np.exp(-acc[n, m] / (m * self.success_radius)))

    def _cls(self, traj: np.ndarray, ref: np.ndarray,
             pl: float, gt_len: float) -> float:
        """Coverage weighted by Length Score (Jain et al. 2019):
        PC = mean_r exp(-d(r, traj)/d_th); EPL = PC * ref_length;
        CLS = PC * EPL / (EPL + |EPL - PL|)."""
        d = np.linalg.norm(ref[:, None, :] - traj[None, :, :], axis=-1)
        pc = float(np.mean(np.exp(-d.min(axis=1) / self.success_radius)))
        epl = pc * gt_len
        denom = epl + abs(epl - pl)
        return pc * (epl / denom if denom > 1e-6 else 1.0)


def make_synthetic_vln(root: str, num_scans: int = 2, nodes_per_scan: int = 9,
                       num_episodes: int = 8, bev_num: int = 900,
                       embed_dims: int = 768, vocab: int = 100,
                       max_text_len: int = 16, seed: int = 0,
                       with_objects: bool = False, num_objects: int = 4):
    """Grid-graph scans + random VER features + shortest-path episodes —
    IN MEMORY, shaped exactly like the loaders' output (load_r2r_split /
    load_graphs / load_ver_features), not written to disk; ``root`` is
    accepted for call-site symmetry only.  Returns (episodes, graphs,
    ver_features); with ``with_objects`` (REVERIE rehearsal) returns a
    4th element: token -> {"ids", "feats"} candidates, each episode's
    target object living at the goal viewpoint with its feature keyed to
    instruction token 0 (so grounding is learnable from the
    instruction)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    graphs, ver = {}, {}
    side = int(np.ceil(np.sqrt(nodes_per_scan)))
    for s in range(num_scans):
        scan = f"syn{s:02d}"
        positions, edges = {}, {}
        for i in range(nodes_per_scan):
            vp = f"n{i:02d}"
            gx, gy = i % side, i // side
            positions[vp] = np.array(
                [gx * 2.5, gy * 2.5, 0.0], np.float32) + rng.normal(
                    0, 0.1, 3).astype(np.float32)
            edges[vp] = []
        for i in range(nodes_per_scan):
            for j in range(nodes_per_scan):
                if i == j:
                    continue
                d = np.linalg.norm(
                    positions[f"n{i:02d}"] - positions[f"n{j:02d}"])
                if d < 3.0:
                    edges[f"n{i:02d}"].append(f"n{j:02d}")
        graphs[scan] = NavGraph(positions, edges)
        for vp in positions:
            ver[f"{scan}_{vp}"] = rng.standard_normal(
                (bev_num, embed_dims)).astype(np.float32)

    objects = None
    signal = None
    assigned: Dict[str, Dict[int, int]] = {}
    if with_objects:
        objects = {}
        signal = rng.standard_normal((vocab, embed_dims)).astype(
            np.float32)
        for token in ver:
            ids = [f"{token}_o{i}" for i in range(num_objects)]
            feats = rng.standard_normal(
                (num_objects, embed_dims)).astype(np.float32)
            objects[token] = {"ids": ids, "feats": feats}

    episodes = []
    for e in range(num_episodes):
        scan = f"syn{e % num_scans:02d}"
        g = graphs[scan]
        nodes = sorted(g.positions)
        start, goal = rng.choice(nodes, 2, replace=False)
        sp = g.shortest_paths(start)
        if goal not in sp:
            goal = start
        path = [start]
        cur = start
        while cur != goal:
            cur = g.shortest_paths(cur)[goal][1]
            path.append(cur)
        toks = np.zeros((max_text_len,), np.int32)
        ntok = int(rng.integers(4, max_text_len))
        toks[:ntok] = rng.integers(1, vocab, ntok)
        ep = dict(scan=scan, path=path, heading=0.0,
                  instruction_tokens=toks,
                  instructions=["synthetic"])
        if with_objects:
            token = f"{scan}_{goal}"
            # one instruction keying per (viewpoint, object): a second
            # episode sharing the goal must not overwrite an already
            # keyed target (that would make the FIRST episode's
            # grounding unlearnable) — claim a fresh object when one is
            # free, else reuse an existing keying and align this
            # episode's token-0 with it
            amap = assigned.setdefault(token, {})
            free = [i for i in range(num_objects) if i not in amap]
            if free:
                tgt = int(rng.choice(free))
                amap[tgt] = int(toks[0])
                objects[token]["feats"][tgt] = (
                    objects[token]["feats"][tgt] * 0.1
                    + 2.0 * signal[toks[0] % vocab])
            else:
                tgt = int(rng.integers(num_objects))
                toks[0] = amap[tgt]
            ep["objId"] = objects[token]["ids"][tgt]
        episodes.append(ep)
    if with_objects:
        return episodes, graphs, ver, objects
    return episodes, graphs, ver
