#!/usr/bin/env python
"""Attribute the detection decoder's on-chip cost (VERDICT r4 #5).

At the round-3 operating point the decoder half is ~1.4 ms/volume (b8) —
~17% of the pipeline — for 6 layers x 100 queries of 768-dim attention:
MXU-starved small matmuls.  This probe times the REAL decoder stack alone
at production shapes (value = the (B, 900, 768) voxel embedding), then
ablated variants (self-attn / 3D-deform cross-attn / FFN / reg-refine
removed one at a time), all via scan-diff inside one jit so tunnel RTT
cancels.  The difference full - ablated attributes each component.

Prints one JSON dict (ms per call at the given batch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--skip", default="",
                   help="comma list of variants to skip")
    p.add_argument("--impl", default="onehot",
                   choices=["onehot", "gather"],
                   help="3D deform sampling path in cross_attn")
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig
    from vln_ver_tpu.models.attention import (MultiheadAttention,
                                              VoxelDeformableAttention3D)
    from vln_ver_tpu.models.decoder import (VoxelDetectionDecoder,
                                            inverse_sigmoid)
    from vln_ver_tpu.models.encoder import FFN
    from vln_ver_tpu.utils.bench import scan_diff_time_stats

    cfg = VERConfig(num_cams=36, dtype=jnp.bfloat16)
    B, nq, C = args.batch, cfg.num_query, cfg.embed_dims
    nv = cfg.bev_num
    shapes = ((cfg.bev_z, cfg.bev_h, cfg.bev_w),)
    rng = np.random.default_rng(0)
    query = jnp.asarray(rng.standard_normal((B, nq, C)), jnp.bfloat16)
    qpos = jnp.asarray(rng.standard_normal((B, nq, C)), jnp.bfloat16)
    value = jnp.asarray(rng.standard_normal((B, nv, C)), jnp.bfloat16)
    refs = jnp.asarray(rng.uniform(0.1, 0.9, (B, nq, 3)), jnp.float32)

    class AblatedLayer(nn.Module):
        """models/decoder.DecoderLayer with one component removable —
        measurement-only mirror, not shipped surface."""
        cfg: VERConfig
        drop: str = ""

        @nn.compact
        def __call__(self, q, v, qp, ref, deterministic=True):
            c = self.cfg
            if self.drop != "self":
                q = MultiheadAttention(
                    embed_dims=c.embed_dims, num_heads=c.num_heads,
                    dropout_rate=c.dropout_rate, dtype=c.dtype,
                    name="self_attn")(q, query_pos=qp, key_pos=qp,
                                      deterministic=True)
            q = nn.LayerNorm(dtype=c.dtype, name="norm1")(q)
            if self.drop != "cross":
                q = VoxelDeformableAttention3D(
                    embed_dims=c.embed_dims, num_heads=c.num_heads,
                    num_levels=c.num_levels,
                    num_points=c.decoder_num_points,
                    dropout_rate=c.dropout_rate, dtype=c.dtype,
                    deform_impl=args.impl,
                    name="cross_attn")(q, v, ref, shapes, query_pos=qp,
                                       deterministic=True)
            q = nn.LayerNorm(dtype=c.dtype, name="norm2")(q)
            if self.drop != "ffn":
                q = FFN(c.embed_dims, c.ffn_dim, c.dropout_rate,
                        dtype=c.dtype, name="ffn")(q, deterministic=True)
            return nn.LayerNorm(dtype=c.dtype, name="norm3")(q)

    class AblatedStack(nn.Module):
        cfg: VERConfig
        drop: str = ""

        @nn.compact
        def __call__(self, q, v, qp, refs):
            c = self.cfg
            for lid in range(c.decoder_layers):
                ref_in = refs[:, :, None, :]
                q = AblatedLayer(c, self.drop, name=f"layer_{lid}")(
                    q, v, qp, ref_in)
                if self.drop != "refine":
                    tmp = nn.Dense(10, name=f"reg_{lid}",
                                   dtype=jnp.float32)(q)
                    xy = tmp[..., 0:2] + inverse_sigmoid(refs[..., 0:2])
                    z = tmp[..., 4:5] + inverse_sigmoid(refs[..., 2:3])
                    refs = jax.lax.stop_gradient(jax.nn.sigmoid(
                        jnp.concatenate([xy, z], -1)))
            return q

    def timed(model, params):
        def make(n):
            @jax.jit
            def fn(params, query, value):
                def body(carry, _):
                    q = model.apply(params, query + carry * 0, value,
                                    qpos, refs)
                    return jnp.sum(q.astype(jnp.float32)).astype(
                        query.dtype), ()
                s, _ = jax.lax.scan(body, jnp.zeros((), query.dtype),
                                    None, length=n)
                return s
            return fn
        st = scan_diff_time_stats(make, (params, query, value),
                                  args.iters, warmup=3,
                                  repeats=args.repeats)
        return st["sec_per_iter"] * 1e3, st["spread"]

    out = {"batch": B, "impl": args.impl}
    skip = set(args.skip.split(",")) if args.skip else set()
    for drop in ("", "self", "cross", "ffn", "refine"):
        if drop in skip:
            continue
        model = AblatedStack(cfg, drop)
        params = model.init(jax.random.PRNGKey(0), query, value, qpos,
                            refs)
        ms, spread = timed(model, params)
        name = drop or "full"
        out[f"{name}_ms"] = round(ms, 3)
        out[f"{name}_spread"] = round(spread, 4)
        print(json.dumps({name: out[f"{name}_ms"]}), flush=True)
    if "full_ms" in out:
        for drop in ("self", "cross", "ffn", "refine"):
            if f"{drop}_ms" in out:
                out[f"attr_{drop}_ms"] = round(
                    out["full_ms"] - out[f"{drop}_ms"], 3)
        out["per_volume_ms"] = round(out["full_ms"] / B, 3)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
