#!/usr/bin/env python
"""Convert DUET/LXMERT cross-modal pretrained weights into VLN fusion-block
params.

Completes the paper's pretrained-stack inheritance beyond the text branch
(tools/convert_text_encoder.py): the cross-modal x-layers of a DUET/HAMT
(or HF LXMERT) torch checkpoint map onto ``VLNPolicy(fusion_arch="bert")``
local/global fusion blocks function-preservingly (parity test:
tests/test_crossmodal_convert.py).

DUET checkpoints carry two stacks (coarse "global" map branch + fine
"local" branch); LXMERT carries one, which is then grafted into both
branches (the DUET paper itself initialises both from the same LXMERT
pretraining).

Usage:
  python tools/convert_crossmodal.py --src duet.pt --out xmodal.msgpack \
      [--heads 12] [--global-prefix global_encoder.] [--local-prefix ...]
Then: tools/train_vln.py --crossmodal-init xmodal.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from convert_text_encoder import load_state_dict  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--global-prefix", default=None,
                   help="state-dict prefix of the global-branch x_layers "
                        "(auto-detected when omitted)")
    p.add_argument("--local-prefix", default=None)
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import flax.serialization

    from vln_ver_tpu.agent.crossmodal import (convert_crossmodal_params,
                                              detect_x_layers)

    sd = load_state_dict(args.src)
    stacks = detect_x_layers(sd)
    if not stacks:
        raise SystemExit("no x_layers.N. keys found in the checkpoint")
    print("detected x-layer stacks:", stacks)

    def pick(want, flag):
        if flag is not None:
            return flag
        cands = [p for p in stacks if want in p]
        if len(cands) == 1:
            return cands[0]
        if len(stacks) == 1:
            return next(iter(stacks))
        raise SystemExit(
            f"ambiguous {want} stack among {list(stacks)}; pass "
            f"--{want}-prefix")

    gp = pick("global", args.global_prefix)
    lp = pick("local", args.local_prefix)
    out = {"meta": {"num_heads": np.int32(args.heads),
                    "num_layers": np.int32(stacks[gp])},
           "global": convert_crossmodal_params(sd, stacks[gp], args.heads,
                                               prefix=gp),
           "local": convert_crossmodal_params(sd, stacks[lp], args.heads,
                                              prefix=lp)}
    hidden = out["global"]["block_0"]["fc2"]["kernel"].shape[1]
    ffn = out["global"]["block_0"]["fc1"]["kernel"].shape[1]
    out["meta"]["hidden"] = np.int32(hidden)
    out["meta"]["ffn_dim"] = np.int32(ffn)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(out))
    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree.leaves((out["global"], out["local"])))
    print(f"converted {n/1e6:.1f}M cross-modal params "
          f"({stacks[gp]} layers, hidden {hidden}, ffn {ffn}, "
          f"global={gp!r} local={lp!r}) -> {args.out}")


if __name__ == "__main__":
    main()
