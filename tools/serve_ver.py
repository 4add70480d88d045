#!/usr/bin/env python
"""VER serving: a persistent batched-inference server for volume requests.

The reference has no serving story (its product path is the offline
``dist_test.sh get_occ.py`` dump); for production deployment this tool
keeps the model resident and serves VER volumes (and, optionally, decoded
occupancy) with micro-batching:

* **Protocol** (dependency-free, works across machines via a shared
  filesystem): a request is ``<queue>/in/<id>.npz`` holding ``features``
  (num_cams, feat_h, feat_w, C), ``world2pixel`` (num_cams, 4, 4) and
  ``origin_shift`` (3,) — exactly the arrays of the MP3D dataset contract
  (data/mp3d.py).  Clients MUST write atomically: save to a dotfile
  (e.g. ``.tmp-<id>``) in the same directory, then ``os.replace`` to
  ``<id>.npz`` — the claimer skips dotfiles, and as a second line of
  defense a request that fails to parse while its mtime is still fresh
  is pushed back to the inbox instead of errored.  With ``--images`` a
  request may instead carry ``images`` (num_cams, H, W, 3) uint8 raw
  panorama views — the fused image->VER program (on-chip ViT frontend +
  lift, models/vit.py) serves it exactly, with a ~2x smaller payload
  than bf16 features; the two request kinds batch separately.  The
  response appears as ``<queue>/out/<id>.npz`` with ``volume``
  (C, Z, H, W), plus ``occupancy`` (N_vox int32 labels) when
  ``--occupancy`` is set.
  Malformed requests produce ``<queue>/out/<id>.error.txt``.
  ``<queue>/in/STOP`` shuts down.
* **One compiled program**: pending requests are padded to the fixed
  ``--batch-max`` by repeating the last row, so XLA compiles exactly one
  batch shape (static shapes; first call pays the compile, every later
  call is steady-state).  Padding rows are dropped before writing.
* **Micro-batching window**: the poll loop sleeps ``--poll-ms`` between
  scans and takes up to ``batch-max`` requests per step, oldest first.

Single-process by design — one chip, one resident program; scale-out is
one server per chip on a shared queue (ids are claimed atomically via
rename, so multiple servers can drain the same inbox).

Tested end-to-end in tests/test_serve.py (synthetic requests, responses
bit-identical to a direct forward).
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class _ClaimKeepAlive:
    """Re-touch claimed request files from a daemon thread while the
    (possibly minutes-long, unbounded first-compile) forward runs, so
    other servers' orphan sweeps never mistake this live server's batch
    for a dead one's.  ``stop()`` is idempotent and joins the thread."""

    def __init__(self, paths, interval_s: float = 60.0):
        self._paths = list(paths)
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(self._interval):
            for p in self._paths:
                try:
                    os.utime(p)
                except OSError:
                    pass  # already reclaimed/served; nothing to protect

    def start(self):
        # touch once immediately: the stale clock starts at claim time,
        # not at the client's write time
        for p in self._paths:
            try:
                os.utime(p)
            except OSError:
                pass
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--queue", required=True,
                   help="queue dir; requests in <queue>/in, responses in "
                        "<queue>/out")
    p.add_argument("--batch-max", type=int, default=8,
                   help="micro-batch capacity (one compiled program)")
    p.add_argument("--poll-ms", type=int, default=50)
    p.add_argument("--occupancy", action="store_true",
                   help="also decode + return dense occupancy labels")
    p.add_argument("--max-requests", type=int, default=None,
                   help="exit after serving N requests (tests)")
    p.add_argument("--images", action="store_true",
                   help="ALSO accept image requests: npz with 'images' "
                        "(num_cams, H, W, 3) uint8 instead of "
                        "'features' — the fused image->VER path runs the "
                        "on-chip ViT frontend + lift in one program "
                        "(exact, and the request payload is ~2x smaller "
                        "than bf16 features). Feature requests keep "
                        "working; the two kinds batch separately")
    p.add_argument("--vit-checkpoint", default=None,
                   help="HF ViTModel torch state dict for --images "
                        "(omit = random init, smoke only)")
    p.add_argument("--hf-prefix", default="")
    p.add_argument("--vit-patch-size", type=int, default=16)
    p.add_argument("--vit-layers", type=int, default=12)
    p.add_argument("--vit-heads", type=int, default=12)
    return p.parse_args()


def _claim(inbox: str, claimed_dir: str, limit: int):
    """Atomically claim up to ``limit`` pending requests (rename into the
    per-server claimed dir; losers of a race just skip).  Dotfiles are
    client write-temps and are never claimed.

    The claimed dir is (re)created on every claim: a peer's orphan sweep
    may rmdir it while we are idle (cross-host pids are unverifiable), and
    without this the rename below would fail ENOENT forever — silently,
    since losing a claim race is also an OSError."""
    os.makedirs(claimed_dir, exist_ok=True)
    try:
        names = sorted(f for f in os.listdir(inbox)
                       if f.endswith(".npz") and not f.startswith("."))
    except FileNotFoundError:
        return []
    got = []
    for name in names[: 4 * limit]:
        src = os.path.join(inbox, name)
        dst = os.path.join(claimed_dir, name)
        try:
            os.rename(src, dst)
        except OSError:
            continue
        got.append(dst)
        if len(got) >= limit:
            break
    return got


def _claim_host() -> str:
    import socket
    return socket.gethostname().replace("-", "_")


def _sweep_orphans(queue: str, inbox: str, max_age_s: float = 300.0):
    """Return requests stranded in dead servers' ``.claimed.*`` dirs to
    the inbox.  A claimed dir is swept when its owner pid is not alive on
    this host, or when its requests have sat longer than ``max_age_s``
    (covers servers on other hosts of a shared filesystem).

    Working servers re-touch their claimed files' mtimes every 60 s from
    a daemon thread (``_ClaimKeepAlive`` in serve()), so an
    alive-but-compiling server never looks stale no matter how long the
    first compile takes; ``max_age_s`` only needs to exceed the keepalive
    interval by a wide margin, not bound compile time.  300 s = 5 missed
    touches proves the owner dead, and keeps recovery of a crashed
    CROSS-HOST server's requests (where the pid check can't see it)
    within minutes rather than tens of minutes.

    Claim dirs are host-qualified (``.claimed.{host}-{pid}``): the pid
    liveness probe is meaningful ONLY for claims made on this host.  For
    another host's claims (or legacy pid-only names from a foreign host)
    ``os.kill(pid, 0)`` would be probing an unrelated local process —
    treating its absence as "owner dead" stole an alive cross-host
    server's fresh claims the moment they were made — so cross-host
    claims are swept on staleness alone."""
    me = _claim_host()
    for name in os.listdir(queue):
        if not name.startswith(".claimed."):
            continue
        d = os.path.join(queue, name)
        rest = name[len(".claimed."):]
        host, _, pidstr = rest.rpartition("-")
        try:
            pid = int(pidstr)
        except ValueError:
            pid = -1
        if pid == os.getpid() and host in ("", me):
            continue  # never touch our own in-flight claims
        # pid liveness is only verifiable for same-host claims; legacy
        # pid-only names are assumed same-host (the old behavior)
        alive = None
        if pid > 0 and host in ("", me):
            try:
                os.kill(pid, 0)
                alive = True
            except OSError:
                alive = False
        try:
            names = list(os.listdir(d))
        except OSError:
            continue  # dir vanished (owner finished a batch) — fine
        for f in names:
            path = os.path.join(d, f)
            try:
                stale = (time.time() - os.path.getmtime(path)) > max_age_s
            except OSError:
                continue  # owner served/removed it between listdir+stat
            if (alive is False) or stale:
                try:
                    os.rename(path, os.path.join(inbox, f))
                except OSError:
                    pass
        # Only remove a PROVEN-dead owner's dir.  An alive (or cross-host,
        # pid-unverifiable) server's empty claimed dir must stay: removing
        # it would make its next _claim os.rename fail ENOENT forever
        # (silently — _claim skips OSError), zombifying a healthy server.
        if alive is False and pid > 0:
            try:
                os.rmdir(d)  # only succeeds when emptied
            except OSError:
                pass


def serve(args) -> int:
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.config import (apply_cfg_options, build_ver_config,
                                    load_config)
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.occupancy import decode_occupancy
    from vln_ver_tpu.train import TrainConfig, create_train_state
    from vln_ver_tpu.utils.checkpoint import latest_step, restore_state

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    ver = build_ver_config(cfg)
    model = VoxelFormer(ver)

    inbox = os.path.join(args.queue, "in")
    outbox = os.path.join(args.queue, "out")
    claimed = os.path.join(args.queue,
                           f".claimed.{_claim_host()}-{os.getpid()}")
    for d in (inbox, outbox, claimed):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    feats0 = rng.standard_normal(
        (1, ver.num_cams, ver.feat_h, ver.feat_w, ver.in_channels)
    ).astype(np.float32)
    w2p0 = np.tile(np.eye(4, dtype=np.float32),
                   (1, ver.num_cams, 1, 1))
    shift0 = np.zeros((1, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), feats0, w2p0, shift0)
    if args.checkpoint:
        state = create_train_state(model, params, TrainConfig())
        state = restore_state(args.checkpoint,
                              latest_step(args.checkpoint), state)
        params = state.params

    B = args.batch_max

    def _heads(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=not args.occupancy)
        bev = outs["bev_embed"]  # (B, bev_num, C)
        vol = bev.reshape(B, ver.bev_z, ver.bev_h, ver.bev_w,
                          ver.embed_dims).transpose(0, 4, 1, 2, 3)
        occ = None
        if args.occupancy:
            occ = jax.vmap(lambda lg: decode_occupancy(
                lg, loss_type=ver.occ_loss_type))(outs["occupancy_preds"])
        return vol, occ

    @jax.jit
    def forward(params, feats, w2p, shift):
        return _heads(params, feats, w2p, shift)

    # fused image->VER program (--images): uint8 views -> on-chip ViT
    # frontend -> lift, one compiled program per request kind
    forward_images = None
    img_params = None
    image_size = ver.feat_h * args.vit_patch_size
    if args.images:
        from vln_ver_tpu.models.vit import (convert_hf_vit_params,
                                            vit_feature_frontend,
                                            vit_for_ver)
        vit = vit_for_ver(ver, patch_size=args.vit_patch_size,
                          num_layers=args.vit_layers,
                          num_heads=args.vit_heads, dtype=ver.dtype)
        if args.vit_checkpoint:
            import torch
            sd = torch.load(args.vit_checkpoint, map_location="cpu")
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            vit_vars = convert_hf_vit_params(sd, args.vit_layers,
                                             args.vit_heads,
                                             prefix=args.hf_prefix)
        else:
            print("serve_ver: no --vit-checkpoint: RANDOM ViT weights "
                  "(smoke only)", flush=True)
            vit_vars = vit.init(jax.random.PRNGKey(1), jnp.zeros(
                (1, image_size, image_size, 3)))

        # ViT weights must be a jit ARGUMENT: closing over the ~86M-param
        # tree bakes ~344 MB of constants into the HLO, which the axon
        # tunnel's compile endpoint rejects (HTTP 413 — same failure
        # fixed in tools/probe_upload_quant.py)
        img_params = {"ver": params, "vit": vit_vars}

        @jax.jit
        def forward_images(p, images, w2p, shift):
            feats = vit_feature_frontend(vit, p["vit"], images)
            return _heads(p["ver"], feats, w2p, shift)

    served = 0
    print(f"serve_ver: queue={args.queue} batch_max={B} "
          f"occupancy={args.occupancy}", flush=True)
    _sweep_orphans(args.queue, inbox)
    last_sweep = time.time()
    while True:
        if os.path.exists(os.path.join(inbox, "STOP")):
            os.remove(os.path.join(inbox, "STOP"))
            break
        if time.time() - last_sweep > 60.0:
            _sweep_orphans(args.queue, inbox)
            last_sweep = time.time()
        reqs = _claim(inbox, claimed, B)
        if not reqs:
            if args.max_requests is not None and served >= args.max_requests:
                break
            time.sleep(args.poll_ms / 1000.0)
            continue

        # two homogeneous micro-batches: feature requests and (--images)
        # image requests each pad to B and run their own compiled program
        groups = {"features": {"x": [], "w": [], "s": [], "ok": []},
                  "images": {"x": [], "w": [], "s": [], "ok": []}}
        for path in reqs:
            try:
                with np.load(path) as z:
                    if "images" in z:
                        if forward_images is None:
                            raise ValueError(
                                "image request but server started "
                                "without --images")
                        kind = "images"
                        x = np.asarray(z["images"], np.uint8)
                        expect = (ver.num_cams, image_size, image_size, 3)
                    else:
                        kind = "features"
                        x = np.asarray(z["features"], np.float32)
                        expect = (ver.num_cams, ver.feat_h, ver.feat_w,
                                  ver.in_channels)
                    w = np.asarray(z["world2pixel"], np.float32)
                    s = np.asarray(z["origin_shift"], np.float32)
                if x.shape != expect or w.shape != (ver.num_cams, 4, 4) \
                        or s.shape != (3,):
                    raise ValueError(
                        f"bad shapes {x.shape} {w.shape} {s.shape}, "
                        f"want {expect} {(ver.num_cams, 4, 4)} (3,)")
                g = groups[kind]
                g["x"].append(x); g["w"].append(w); g["s"].append(s)
                g["ok"].append(path)
            except Exception as e:
                if not os.path.exists(path):
                    # a peer's orphan sweep reclaimed it between our claim
                    # and the keepalive's first touch (possible when the
                    # inbox backlog exceeds max_age_s, since rename keeps
                    # the client's mtime) — the peer serves it; no error
                    continue
                # a freshly-written file may be a non-atomic client's
                # half-write — push it back once instead of erroring
                try:
                    fresh = (time.time() - os.path.getmtime(path)) < 2.0
                except OSError:
                    fresh = False
                if fresh:
                    try:
                        os.rename(path,
                                  os.path.join(inbox,
                                               os.path.basename(path)))
                        continue
                    except OSError:
                        pass
                rid = os.path.basename(path)[:-4]
                with open(os.path.join(outbox, f"{rid}.error.txt"),
                          "w") as fh:
                    fh.write(repr(e))
                try:
                    os.remove(path)
                except OSError:
                    pass  # swept by a peer after the exists() check
        all_ok = groups["features"]["ok"] + groups["images"]["ok"]
        if not all_ok:
            continue

        # Freshen claim mtimes AFTER validation (touching at claim time
        # would make every malformed request look like a fresh half-write
        # — the error path checks the client's mtime — and bounce it
        # forever), then KEEP re-touching from a daemon thread while the
        # forward runs: a first compile through the tunnel is unbounded
        # above (5-10+ min observed), so a one-shot touch cannot bound
        # the stale-sweep window on other servers — the keepalive makes
        # "stale" mean "owner stopped touching", i.e. actually dead.
        keepalive = _ClaimKeepAlive(all_ok, interval_s=60.0)
        keepalive.start()
        results = []  # (path, volume, occupancy-or-None)
        try:
            for kind, fwd, fp in (("features", forward, params),
                                  ("images", forward_images, img_params)):
                g = groups[kind]
                if not g["ok"]:
                    continue
                n = len(g["ok"])
                bx, bw, bs = list(g["x"]), list(g["w"]), list(g["s"])
                while len(bx) < B:  # pad to the compiled batch
                    bx.append(bx[-1]); bw.append(bw[-1]); bs.append(bs[-1])
                vol, occ = fwd(fp, jnp.asarray(np.stack(bx)),
                               jnp.asarray(np.stack(bw)),
                               jnp.asarray(np.stack(bs)))
                vol = np.asarray(vol[:n])
                occ = np.asarray(occ[:n]) if occ is not None else None
                results += [(p, vol[i],
                             occ[i] if occ is not None else None)
                            for i, p in enumerate(g["ok"])]
        finally:
            keepalive.stop()
        for path, vol_i, occ_i in results:
            rid = os.path.basename(path)[:-4]
            out = {"volume": vol_i}
            if occ_i is not None:
                out["occupancy"] = occ_i.astype(np.int32)
            tmp = os.path.join(outbox, f".{rid}.tmp.npz")
            np.savez(tmp, **out)
            os.replace(tmp, os.path.join(outbox, f"{rid}.npz"))
            try:
                os.remove(path)
            except OSError:
                # another server's orphan sweep reclaimed it mid-batch;
                # the response is already written, don't crash
                pass
        served += len(results)
        if args.max_requests is not None and served >= args.max_requests:
            break
    print(f"serve_ver: done, served {served}", flush=True)
    return served


if __name__ == "__main__":
    serve(parse_args())
