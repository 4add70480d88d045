"""Host->device staging for the train loop (the ver_writer recipe).

The dump loop (vln_ver_tpu/ver_writer.py) showed the product-path cost
on this environment is dominated by host work + the host->device
transfer, and that a ONE-AHEAD transfer thread hides it behind device
compute.  The train loop has the same structure (reference: a 4-worker
torch DataLoader feeding DDP steps, datasets/builder.py:19 + vocc.py:223)
— :func:`staged_batches` applies the same fix: while the jitted step for
batch k is dispatched (async on the remote backend), batch k+1's
``device_put``/``shard_batch`` runs on a transfer thread, so upload and
compute overlap instead of serializing.

Placement math is unchanged — the wrapper calls the exact ``place``
closure the loop used inline, just one batch ahead on another thread
(JAX device_put is thread-safe; the arrays land on the same shardings).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


def staged_batches(batches: Iterable, place: Callable,
                   name: str = "train_transfer") -> Iterator:
    """Yield ``place(batch)`` for each host batch, computing the NEXT
    placement on a transfer thread while the caller consumes the current
    one.  Exceptions from ``place`` (or the underlying iterator) re-raise
    in the consumer at the corresponding ``next()``."""
    it = iter(batches)
    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix=name)
    try:
        first = next(it, _SENTINEL)
        if first is _SENTINEL:
            return
        fut = pool.submit(place, first)
        for nxt in it:
            cur = fut.result()
            fut = pool.submit(place, nxt)
            yield cur
        yield fut.result()
    finally:
        pool.shutdown(wait=False)


_SENTINEL = object()
