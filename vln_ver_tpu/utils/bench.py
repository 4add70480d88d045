"""Shared benchmarking plumbing for the perf CLIs.

Two building blocks used by bench.py, tools/bench_train.py,
tools/profile_parts.py, tools/probe_deform.py, tools/check_determinism.py:

* :func:`enable_compile_cache` — the persistent compile cache; full-size
  compiles through the axon TPU tunnel take minutes, caching them across
  runs is load-bearing.
* :func:`scan_diff_time` — device-honest timing on the remote backend:
  the axon tunnel neither blocks in ``block_until_ready`` nor has
  negligible dispatch RTT, so work is scanned INSIDE one jit (serialized
  by a data dependency) and the per-iteration time is the difference of a
  short and a long scan, cancelling RTT and fixed overhead.
"""

from __future__ import annotations

import os
import time
from typing import Callable


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax
    cache_dir = cache_dir or os.environ.get("JAX_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def scan_diff_time_stats(make_fn: Callable[[int], Callable], args: tuple,
                         iters: int, warmup: int = 2,
                         base_len: int = 2, repeats: int = 5) -> dict:
    """Per-iteration time of the scanned body, with dispersion.

    ``make_fn(n)`` must return a jitted callable running the body ``n``
    times inside one program and returning a scalar (fetched to force
    completion).  The per-iteration estimate is
    ``(min t(base+iters) - min t(base)) / iters`` over ``repeats`` timed
    fetches of each program: the tunnel adds tens of ms of noisy RTT per
    fetch, and the min is the standard noise-robust estimate of the true
    device time (a single-sample difference was observed to swing the
    reported throughput by ~20%).

    Returns a dict:
      sec_per_iter    — the min-based estimate (the headline number)
      sec_per_iter_med— median-based variant (robust to one lucky min)
      spread          — (max - min) of the per-sample long-program
                        estimates divided by the headline, i.e. the
                        relative dispersion window any round-over-round
                        comparison must beat before it means anything
      samples         — the raw per-sample long-program per-iter times
    """
    import numpy as np

    short, long_ = make_fn(base_len), make_fn(base_len + iters)
    out = None
    for _ in range(warmup):
        out = float(short(*args))
    float(long_(*args))  # warm the long program

    def timed(fn):
        t0 = time.perf_counter()
        val = float(fn(*args))
        return time.perf_counter() - t0, val

    t_short = min(timed(short)[0] for _ in range(repeats))
    samples = [timed(long_) for _ in range(repeats)]
    t_longs = [t for t, _ in samples]
    out = samples[-1][1]
    assert np.isfinite(out), out
    per_iter = [max(t - t_short, 1e-6) / iters for t in t_longs]
    best = min(per_iter)
    return dict(
        sec_per_iter=best,
        sec_per_iter_med=float(np.median(per_iter)),
        spread=(max(per_iter) - best) / best,
        samples=per_iter,
    )


def scan_diff_time(make_fn: Callable[[int], Callable], args: tuple,
                   iters: int, warmup: int = 2,
                   base_len: int = 2, repeats: int = 3) -> float:
    """Seconds per iteration (min-based) — see scan_diff_time_stats."""
    return scan_diff_time_stats(make_fn, args, iters, warmup=warmup,
                                base_len=base_len,
                                repeats=repeats)["sec_per_iter"]
