"""Pretrained text-encoder conversion: HF BertModel -> TextEncoder("bert").

The paper's agent initialises its instruction branch from a pretrained
BERT stack (DUET/HAMT lineage).  These tests prove the conversion is
function-preserving: a torch ``BertModel`` (random init — no download) and
the converted flax ``TextEncoder`` must produce the same token features.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vln_ver_tpu.agent.text import TextEncoder, convert_hf_bert_params


def _tiny_bert(seed=0):
    cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return cfg, model


def test_bert_conversion_matches_torch():
    cfg, model = _tiny_bert()
    rng = np.random.default_rng(0)
    b, l = 3, 17
    tokens = rng.integers(3, cfg.vocab_size, (b, l))
    lengths = np.array([17, 9, 5])
    mask = np.arange(l)[None, :] < lengths[:, None]
    tokens = tokens * mask

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(tokens),
                    attention_mask=torch.tensor(mask.astype(np.int64))
                    ).last_hidden_state.numpy()

    enc = TextEncoder(vocab_size=cfg.vocab_size,
                      embed_dims=cfg.hidden_size,
                      num_layers=cfg.num_hidden_layers,
                      num_heads=cfg.num_attention_heads,
                      ffn_dim=cfg.intermediate_size,
                      max_len=cfg.max_position_embeddings,
                      dropout_rate=0.0, arch="bert")
    params = convert_hf_bert_params(model.state_dict(),
                                    num_layers=cfg.num_hidden_layers,
                                    num_heads=cfg.num_attention_heads)
    import jax.numpy as jnp
    out = enc.apply(params, jnp.asarray(tokens), jnp.asarray(mask),
                    deterministic=True)
    out = np.asarray(out)
    # only valid positions are comparable (HF computes self-attn FROM padded
    # queries too, but downstream consumers mask them; we check real tokens)
    err = np.abs(out - ref)[mask]
    assert err.max() < 2e-5, err.max()


def test_bert_conversion_tree_matches_init():
    """Converted tree must be structurally identical to a fresh init —
    guards against silent key/shape drift (optimizer init depends on it)."""
    cfg, model = _tiny_bert()
    enc = TextEncoder(vocab_size=cfg.vocab_size,
                      embed_dims=cfg.hidden_size,
                      num_layers=cfg.num_hidden_layers,
                      num_heads=cfg.num_attention_heads,
                      ffn_dim=cfg.intermediate_size,
                      max_len=cfg.max_position_embeddings, arch="bert")
    import jax

    init = enc.init(jax.random.PRNGKey(0),
                    np.zeros((1, 5), np.int32), np.ones((1, 5), bool))
    conv = convert_hf_bert_params(model.state_dict(),
                                  num_layers=cfg.num_hidden_layers,
                                  num_heads=cfg.num_attention_heads)
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(conv)[0]
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    assert paths_i == paths_c


def test_text_init_roundtrip_into_policy(tmp_path):
    """Full --text-init path: converted blob -> msgpack -> PolicyConfig
    overrides -> grafted into VLNPolicy params -> policy forward works and
    the text branch output equals the torch BERT."""
    import sys

    import flax.serialization
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tools")
    cfg, model = _tiny_bert()
    params = convert_hf_bert_params(model.state_dict(),
                                    num_layers=cfg.num_hidden_layers,
                                    num_heads=cfg.num_attention_heads)
    blob = flax.serialization.msgpack_serialize({
        "meta": {k: np.int32(v) for k, v in dict(
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            hidden=cfg.hidden_size, vocab_size=cfg.vocab_size,
            max_len=cfg.max_position_embeddings,
            ffn_dim=cfg.intermediate_size).items()},
        "params": params["params"]})
    path = tmp_path / "bert.msgpack"
    path.write_bytes(blob)

    from train_vln import load_text_init
    overrides, text_params = load_text_init(str(path))
    assert overrides["text_arch"] == "bert"
    assert overrides["embed_dims"] == cfg.hidden_size

    from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
    pcfg = PolicyConfig(num_heads=cfg.num_attention_heads,
                        fusion_layers=1, ffn_dim=64, max_nodes=4,
                        bev_z=1, bev_h=2, bev_w=2, num_query_tokens=2,
                        **overrides)
    policy = VLNPolicy(pcfg)
    b, l = 2, 9
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (b, l)))
    mask = jnp.ones((b, l), bool)
    volume = jnp.asarray(rng.standard_normal(
        (b, 4, pcfg.embed_dims)).astype(np.float32))
    mem = init_memory(b, pcfg.max_nodes, pcfg.embed_dims)
    pos = jnp.zeros((b, 3))
    slot = jnp.zeros((b,), jnp.int32)
    pparams = policy.init(jax.random.PRNGKey(0), tokens, mask, volume,
                          mem, pos, slot)
    import flax.core
    pparams = flax.core.unfreeze(pparams)
    pparams["params"]["text_encoder"] = jax.tree.map(jnp.asarray,
                                                     text_params)
    out = policy.apply(pparams, tokens, mask, volume, mem, pos, slot)
    assert np.all(np.isfinite(np.asarray(out.logits)))

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(np.asarray(tokens)),
                    attention_mask=torch.ones((b, l), dtype=torch.long)
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out.text_feats), ref, atol=2e-5)


def test_wordpiece_matches_hf_tokenizer(tmp_path):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "walk", "to", "the",
             "kitchen", "turn", "left", "right", "##s", "##ing", "down",
             "stair", "hall", "##way", "and", "stop", "."]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(words) + "\n")

    from vln_ver_tpu.agent.data import WordPieceVocab
    ours = WordPieceVocab(str(vocab_file))
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)

    for text in ["Walk down the stairs and stop.",
                 "turn lefts into the hallway",
                 "unknownword kitchen turning"]:
        ref = hf.encode(text, add_special_tokens=True)
        got = ours.encode(text, max_len=32)
        got = got[:np.max(np.nonzero(got)) + 1] if got.any() else got[:0]
        assert list(got) == ref, (text, list(got), ref)


def test_wordpiece_truncation_keeps_sep(tmp_path):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "walk", "to", "the"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(words) + "\n")
    from vln_ver_tpu.agent.data import WordPieceVocab
    v = WordPieceVocab(str(vocab_file))
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    text = " ".join(["walk to the"] * 20)   # 60 tokens + specials
    max_len = 16
    ours = list(v.encode(text, max_len))
    ref = hf.encode(text, add_special_tokens=True, max_length=max_len,
                    truncation=True)
    assert ours == ref, (ours, ref)
    assert ours[-1] == v.sep
