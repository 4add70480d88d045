#!/usr/bin/env python
"""On-chip probe of the deformable-attention BACKWARD cost.

The reference pairs its CUDA forward with a dedicated fused backward
(`modules/multi_scale_deformable_attn_function.py:74-85`); here the
backward is whatever autodiff derives from the chosen forward
formulation.  This tool measures, per op call at the in-model encoder
shape, scan-differenced on the real chip:

  * forward-only time, and
  * value_and_grad time w.r.t. (value, sampling_locations,
    attention_weights) — the same cotangents the CUDA kernel produces,

for both the MXU one-hot formulation (the in-model default) and the
gather formulation.  bwd = grad - fwd.  Multiplying by
``encoder_layers`` calls/step bounds the deform share of the train
step's grad phase — the decision input for whether a fused Pallas VJP
is worth building (VERDICT r2 #3; results in docs/performance.md).

Usage:
  python tools/probe_deform_bwd.py --bs 24    # vocc train shape (4x6cam)
  python tools/probe_deform_bwd.py --bs 144   # 36-cam shape (4x36cam)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=24,
                   help="batch*cams rows (24 = vocc train shape)")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--impls", default="onehot,gather")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax.numpy as jnp

    from vln_ver_tpu.ops.deform_attn import (ms_deform_attn_2d,
                                             ms_deform_attn_2d_onehot)
    from vln_ver_tpu.utils.bench import scan_diff_time

    bs, nq, H, P, h, w, hd = args.bs, 900, 8, 8, 14, 14, 96
    shapes = ((h, w),)
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.random((bs, h * w, H, hd)), cdt)
    loc = jnp.asarray(rng.random((bs, nq, H, 1, P, 2)), jnp.float32)
    wgt = jnp.asarray(rng.random((bs, nq, H, 1, P)), cdt)

    impls = {"onehot": ms_deform_attn_2d_onehot,
             "gather": ms_deform_attn_2d}

    out = {"bs": bs, "dtype": args.dtype, "unit": "ms/call"}
    for name in args.impls.split(","):
        op = impls[name]

        def scan_fwd(n):
            @jax.jit
            def fn(value, loc, wgt):
                def body(carry, _):
                    v = value + carry.astype(cdt)
                    o = op(v, shapes, loc, wgt)
                    return jnp.sum(o.astype(jnp.float32)) * 0, ()
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=n)
                return s
            return fn

        def scan_grad(n):
            def loss(value, loc, wgt):
                return jnp.sum(op(value, shapes, loc, wgt).astype(
                    jnp.float32))

            @jax.jit
            def fn(value, loc, wgt):
                def body(carry, _):
                    v = value + carry.astype(cdt)
                    l, grads = jax.value_and_grad(
                        loss, argnums=(0, 1, 2))(v, loc, wgt)
                    gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in grads)
                    return (l + gsum) * 0, ()
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=n)
                return s
            return fn

        t_f = scan_diff_time(scan_fwd, (value, loc, wgt), args.iters)
        t_g = scan_diff_time(scan_grad, (value, loc, wgt), args.iters)
        out[name] = {"fwd_ms": round(t_f * 1e3, 3),
                     "fwd_bwd_ms": round(t_g * 1e3, 3),
                     "bwd_ms": round((t_g - t_f) * 1e3, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
