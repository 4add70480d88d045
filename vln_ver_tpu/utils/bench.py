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
    except Exception as e:  # pragma: no cover - config drift across jax
        # the cache is LOAD-BEARING here (full-size compiles through the
        # tunnel cost 5-10+ min) — degrade loudly, not silently
        import sys
        print(f"WARNING: persistent compile cache NOT enabled ({e!r}); "
              "expect multi-minute recompiles", file=sys.stderr)


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
    # a long-program sample timing BELOW min(t_short) is noise inversion
    # (tiny workloads / a wild tunnel session) — DROP it rather than
    # clamp it: a clamped near-zero diff would become the min and print
    # an absurd headline throughput with no error
    per_iter = [(t - t_short) / iters for t in t_longs
                if t - t_short > 0]
    if not per_iter:
        raise RuntimeError(
            "scan_diff_time: every long-program sample timed at or "
            "below the short program — the workload is too small (or "
            "the session too noisy) to difference; raise `iters`")
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


def full_forward_scan(model):
    """The ONE scan-body builder bench.py and tools/bench_sweep.py share,
    so the compiled program (and the compile-cache key) cannot drift
    between them: ``run_n(n)`` returns a jitted fn scanning ``n`` full
    forwards serialized by a data dependency, reducing over EVERY head
    output (a bev+occ-only reduction lets XLA DCE the whole DETR
    decoder — the round-4 bench-honesty bug)."""
    import jax
    import jax.numpy as jnp

    def run_n(n):
        @jax.jit
        def fn(params, feats, w2p, shift):
            def body(carry, _):
                f = feats + carry * jnp.bfloat16(0)
                outs = model.apply(params, f, w2p, shift,
                                   deterministic=True)
                s = (jnp.sum(outs["bev_embed"].astype(jnp.float32))
                     + jnp.sum(outs["occupancy_preds"].astype(jnp.float32))
                     + jnp.sum(outs["all_cls_scores"].astype(jnp.float32))
                     + jnp.sum(outs["all_bbox_preds"].astype(jnp.float32)))
                return s.astype(jnp.bfloat16), ()
            s, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return s
        return fn

    return run_n
