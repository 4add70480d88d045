"""Parameter-tree accounting shared by the fidelity tools and the parity
tests (tools/fidelity_train.py, tests/test_train_dynamics_parity.py,
tests/test_multiprocess_train.py, tests/multiproc_train_worker.py) — one
owner for the flatten helper and the gradient-free key lists, so a change
to which params are gradient-free cannot silently desynchronise the
full-size fidelity tool from the CI parity test.
"""

from __future__ import annotations

import numpy as np

# Params with NO gradient path at all in the default (det+occ,
# add_layout off) config:
#   - positional_encoding: inert on the active path (the reference
#     computes it but the encoder never consumes it — models/encoder.py
#     docstring);
#   - query_layout_embedding: the layout branch is built but unused by
#     the default loss (reference head._init_layers vs loss()).
# torch autograd gives these grad=None and torch.optim SKIPS them
# entirely (no weight decay), while optax applies weight decay to
# zero-grad params — so jax-vs-torch drift comparisons exclude them and
# bound the jax-side decay separately
# (tests/test_train_dynamics_parity.py::test_nograd_params_only_decay).
NOGRAD_PARAM_KEYS = ("positional_encoding", "query_layout_embedding")

# Params whose gradient is STRUCTURALLY ZERO but still produced by
# autograd on both frameworks: the decoder self-attention key bias —
# q·(k+b) shifts every logit of a query by the same q·b, which softmax
# cancels exactly.  Under Adam, a zero gradient makes the first update
# ±lr·sign(fp32 noise) per element, so the drift on BOTH sides is pure
# sign noise: excluded from relative-L2 drift metrics (the element-wise
# sign-flip bound still applies).
ZEROGRAD_NOISE_KEYS = ("self_attn/attn/key/bias",)

# The union — what a plain "did training move the same way" comparison
# should skip.
DRIFT_EXCLUDE_KEYS = NOGRAD_PARAM_KEYS + ZEROGRAD_NOISE_KEYS


def flatten_params(tree: dict, prefix: str = "",
                   dtype=np.float64) -> dict:
    """Flatten a nested param dict to ``{'a/b/c': np.ndarray}``."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key, dtype))
        else:
            out[key] = np.asarray(v, dtype)
    return out


def drift_rel_l2(init: dict, a: dict, b: dict,
                 exclude=DRIFT_EXCLUDE_KEYS):
    """Relative-L2 agreement of two parameter drifts from a common init.

    Returns ``(global_rel, (worst_rel, worst_key))`` where
    ``global_rel = ||(a-init) - (b-init)||_2 / ||b-init||_2`` accumulated
    over all non-excluded leaves and ``worst`` is the single worst leaf.
    """
    num2 = den2 = 0.0
    worst = (0.0, None)
    for k in init:
        if any(s in k for s in exclude):
            continue
        da = a[k] - init[k]
        db = b[k] - init[k]
        num = float(np.linalg.norm(da - db))
        den = float(np.linalg.norm(db)) + 1e-30
        num2 += num ** 2
        den2 += den ** 2
        if num / den > worst[0]:
            worst = (num / den, k)
    return (num2 ** 0.5) / max(den2 ** 0.5, 1e-30), worst
