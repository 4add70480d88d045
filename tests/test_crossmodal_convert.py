"""Cross-modal pretrained-stack conversion: LXMERT/DUET x-layers ->
VLNPolicy fusion blocks (fusion_arch="bert").

Completes the paper's pretrained inheritance beyond the text branch: the
vision stream of an LXMERT cross-modal layer (cross-attend language ->
self-attend -> FFN, post-LN) must reproduce bit-near-exactly through
``convert_crossmodal_params``.  Oracle: HF ``LxmertXLayer`` (random init —
no download), the exact architecture DUET/HAMT inherit.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from vln_ver_tpu.agent.crossmodal import (convert_crossmodal_params,
                                          detect_x_layers)
from vln_ver_tpu.agent.policy import PolicyConfig, VLNPolicy, _FusionBlock


def _xlayer(seed=0, hidden=32, heads=4, inter=64):
    from transformers.models.lxmert.modeling_lxmert import LxmertXLayer
    cfg = transformers.LxmertConfig(
        hidden_size=hidden, num_attention_heads=heads,
        intermediate_size=inter, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    layer = LxmertXLayer(cfg)
    layer.eval()
    return cfg, layer


def _visn_forward(layer, lang, lang_mask, visn):
    """Vision-stream output of the HF x-layer (the half our fusion blocks
    reproduce; the language half is ignored, as in DUET)."""
    ext = (1.0 - torch.tensor(lang_mask, dtype=torch.float32)
           [:, None, None, :]) * -10000.0
    with torch.no_grad():
        lang_att, visn_att = layer.cross_att(
            torch.tensor(lang), ext, torch.tensor(visn), None)
        lang_att, visn_att = layer.self_att(lang_att[0], ext,
                                            visn_att[0], None)
        _, visn_out = layer.output_fc(lang_att, visn_att)
    return visn_out.numpy()


def _pcfg(cfg, **kw):
    base = dict(embed_dims=cfg.hidden_size,
                num_heads=cfg.num_attention_heads,
                ffn_dim=cfg.intermediate_size, dropout_rate=0.0,
                fusion_arch="bert")
    base.update(kw)
    return PolicyConfig(**base)


def test_xlayer_conversion_matches_torch():
    cfg, layer = _xlayer()
    sd = {f"x_layers.0.{k}": v for k, v in layer.state_dict().items()}
    blocks = convert_crossmodal_params(sd, num_layers=1,
                                       num_heads=cfg.num_attention_heads)

    rng = np.random.default_rng(0)
    b, lt, lv = 2, 11, 7
    lang = rng.standard_normal((b, lt, cfg.hidden_size)).astype(np.float32)
    visn = rng.standard_normal((b, lv, cfg.hidden_size)).astype(np.float32)
    lang_mask = (np.arange(lt)[None] < np.array([[11], [6]])).astype(bool)

    ref = _visn_forward(layer, lang, lang_mask.astype(np.float32), visn)

    blk = _FusionBlock(_pcfg(cfg))
    out = blk.apply({"params": blocks["block_0"]}, jnp.asarray(visn),
                    jnp.ones((b, lv), bool), jnp.asarray(lang),
                    jnp.asarray(lang_mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_converted_tree_matches_block_init():
    """Converted per-layer tree must be structurally identical to a fresh
    _FusionBlock init (guards against key/shape drift)."""
    cfg, layer = _xlayer()
    sd = {f"x_layers.0.{k}": v for k, v in layer.state_dict().items()}
    blocks = convert_crossmodal_params(sd, 1, cfg.num_attention_heads)
    blk = _FusionBlock(_pcfg(cfg))
    init = blk.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 3, cfg.hidden_size)),
                    jnp.ones((1, 3), bool),
                    jnp.zeros((1, 5, cfg.hidden_size)),
                    jnp.ones((1, 5), bool))
    paths = lambda t: {jax.tree_util.keystr(p): v.shape for p, v in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(init["params"]) == paths(blocks["block_0"])


def test_duet_two_stack_detection_and_policy_graft():
    """DUET-style checkpoint (global_encoder./local_encoder. stacks with
    crossattention.att naming) grafts into a full VLNPolicy whose local
    branch then matches the torch vision-stream stack end-to-end."""
    cfg, l0 = _xlayer(seed=1)
    _, l1 = _xlayer(seed=2)

    def duet_keys(layer, stack, i):
        out = {}
        for k, v in layer.state_dict().items():
            k = k.replace("visual_attention.att.", "crossattention.att.")
            k = k.replace("visual_attention.output.",
                          "crossattention.output.")
            out[f"{stack}.x_layers.{i}.{k}"] = v
        return out

    sd = {}
    sd.update(duet_keys(l0, "global_encoder", 0))
    sd.update(duet_keys(l1, "global_encoder", 1))
    sd.update(duet_keys(l1, "local_encoder", 0))
    sd.update(duet_keys(l0, "local_encoder", 1))
    stacks = detect_x_layers(sd)
    assert stacks == {"global_encoder.": 2, "local_encoder.": 2}

    heads = cfg.num_attention_heads
    glob = convert_crossmodal_params(sd, 2, heads,
                                     prefix="global_encoder.")
    loc = convert_crossmodal_params(sd, 2, heads, prefix="local_encoder.")

    pcfg = _pcfg(cfg, fusion_layers=2, text_layers=1, vocab_size=50,
                 max_text_len=12, max_nodes=4, bev_z=1, bev_h=2, bev_w=2,
                 num_query_tokens=3)
    policy = VLNPolicy(pcfg)
    rng = np.random.default_rng(3)
    b, l = 2, 9
    tokens = jnp.asarray(rng.integers(3, 50, (b, l)))
    mask = jnp.ones((b, l), bool)
    volume = jnp.asarray(rng.standard_normal(
        (b, 4, pcfg.embed_dims)).astype(np.float32))
    from vln_ver_tpu.agent.memory import init_memory
    mem = init_memory(b, pcfg.max_nodes, pcfg.embed_dims)
    params = policy.init(jax.random.PRNGKey(0), tokens, mask, volume, mem,
                         jnp.zeros((b, 3)), jnp.zeros((b,), jnp.int32))
    import flax.core
    params = flax.core.unfreeze(params)
    for i in range(2):
        params["params"][f"global_block_{i}"] = glob[f"block_{i}"]
        params["params"][f"local_block_{i}"] = loc[f"block_{i}"]
    out = policy.apply(params, tokens, mask, volume, mem,
                       jnp.zeros((b, 3)), jnp.zeros((b,), jnp.int32))
    assert np.all(np.isfinite(np.asarray(out.logits)))

    # local branch parity: tokenized volume -> block_0 (l1) -> block_1 (l0)
    text = np.asarray(out.text_feats)
    ltok = np.asarray(policy.apply(
        params, volume, method=lambda m, v: m.ver_tokenizer(v)))
    x = ltok
    for layer in (l1, l0):
        x = _visn_forward(layer, text, np.ones((b, l), np.float32), x)
    blk_out = ltok
    for i in range(2):
        blk_out = _FusionBlock(pcfg).apply(
            {"params": params["params"][f"local_block_{i}"]},
            jnp.asarray(blk_out), jnp.ones((b, ltok.shape[1]), bool),
            jnp.asarray(text), mask, deterministic=True)
        # cross-check each stage against torch up to that depth
    np.testing.assert_allclose(np.asarray(blk_out), x, atol=3e-5)
