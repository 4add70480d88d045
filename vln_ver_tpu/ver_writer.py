"""VER volume dump — the pipelined product path (SURVEY.md §3.3).

The reference's dump loop (voxelformer_occupancy_head.py:627-638 driven by
tools/test.py's batch loop) serializes three stages per batch: device
compute, the device->host fetch, and gzip+HDF5 write.  On the axon TPU
backend the fetch blocks on a tunnel with real RTT and the host has one
core, so the naive loop runs at a fraction of the device's forward rate.

:func:`dump_volumes` overlaps the stages:

* batch k+1 is DISPATCHED (async on the remote backend) before batch k's
  fetch blocks — device compute hides behind the host work;
* gzip + HDF5 writes run on a writer thread that exclusively owns the
  output file (h5py has no concurrent writers), bounded by a small queue;
* the dataset iterator already prefetches on its own thread
  (data.mp3d.iterate_batches).

Write order, dataset names, dtype, and bytes are identical to the serial
loop (``serial=True`` keeps the naive ordering as the oracle —
tests/test_get_occ_pipeline.py proves file equality).

The capacity-bounded sparse lift's ``sca_overflow`` guard is accumulated
ON DEVICE across batches (no per-batch fetch RTT) and returned once.
"""

from __future__ import annotations

import queue as queue_mod
import threading
import time
from typing import Optional


def dump_volumes(bev_only, params, ver, dataset, savename: str,
                 batch_size: int = 1, indices=None,
                 gzip_level: int = 4, serial: bool = False,
                 mesh=None) -> dict:
    """Run ``bev_only(params, feats, w2p, shift) -> (bev, overflow)`` over
    ``dataset`` and append each volume to ``savename`` (HDF5, key=token,
    gzip) in the reference dump schema.

    Returns ``dict(written, seconds, volumes_per_sec, sca_overflow)``.
    Raises nothing on overflow — the CALLER decides (tools/get_occ.py
    fails fast; bench reports).
    """
    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data.mp3d import iterate_batches

    if mesh is not None:
        from .parallel import pad_and_shard

    write_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
    werr: list = []
    written = 0

    def _write(outf, tokens, vol):
        nonlocal written
        for i, token in enumerate(tokens):
            if token in outf:
                del outf[token]
            outf.create_dataset(token, data=vol[i], compression="gzip",
                                compression_opts=gzip_level)
            written += 1

    def writer():
        try:
            with h5py.File(savename, "a") as outf:
                while True:
                    item = write_q.get()
                    if item is None:
                        return
                    _write(outf, *item)
        except BaseException as e:
            werr.append(e)
            while True:   # drain so the producer never blocks on put()
                try:
                    if write_q.get_nowait() is None:
                        return
                except queue_mod.Empty:
                    return

    wt = None
    if not serial:
        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

    def fetch_vol(pending):
        bev_dev, tokens, real = pending
        bev = np.asarray(bev_dev)[:real]   # blocks on the tunnel fetch
        # (B, bev_num, C) -> (B, C, Z, H, W) — dump layout parity with
        # the reference (head:634-636)
        b = bev.shape[0]
        vol = bev.reshape(b, ver.bev_z, ver.bev_h, ver.bev_w,
                          ver.embed_dims).transpose(0, 4, 1, 2, 3)
        return tokens, np.ascontiguousarray(vol, dtype=np.float32)

    def fetch_and_enqueue(pending):
        tokens, vol = fetch_vol(pending)
        if werr:
            raise RuntimeError("HDF5 writer failed") from werr[0]
        write_q.put((tokens, vol))

    t0 = time.perf_counter()
    pending = None
    overflow_dev = None
    serial_file = h5py.File(savename, "a") if serial else None
    try:
        for batch in iterate_batches(dataset, batch_size,
                                     indices=indices, drop_last=False):
            feats, w2p, shift = (batch["features"], batch["world2pixel"],
                                 batch["origin_shift"])
            real = feats.shape[0]
            if mesh is not None:
                # pad short batches to the ONE compiled batch shape
                s, real = pad_and_shard(
                    mesh, {"features": feats, "world2pixel": w2p,
                           "origin_shift": shift}, batch_size)
                feats, w2p, shift = (s["features"], s["world2pixel"],
                                     s["origin_shift"])
            bev_dev, ovf = bev_only(params, feats, w2p, shift)  # async
            overflow_dev = (ovf if overflow_dev is None
                            else jnp.maximum(overflow_dev, ovf))
            item = (bev_dev, list(batch["token"]), real)
            if serial:
                _write(serial_file, *fetch_vol(item))
            else:
                if pending is not None:
                    fetch_and_enqueue(pending)
                pending = item
        if not serial:
            if pending is not None:
                fetch_and_enqueue(pending)
            write_q.put(None)
            wt.join()
            if werr:
                raise RuntimeError("HDF5 writer failed") from werr[0]
    finally:
        if serial_file is not None:
            serial_file.close()
    dt = time.perf_counter() - t0
    overflow = (int(jax.device_get(overflow_dev))
                if overflow_dev is not None else 0)
    return dict(written=written, seconds=dt,
                volumes_per_sec=written / max(dt, 1e-9),
                sca_overflow=overflow)
