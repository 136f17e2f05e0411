"""PaliGemma: SigLIP vision tower + gemma prefix-LM text tower
(reference vllm/model_executor/models/paligemma.py, siglip.py).

The reference serves paligemma with plain causal attention; HF (and the
model's training) run the WHOLE prompt bidirectionally at inference
(modeling_paligemma._update_causal_mask non-training branch). We match
HF: ModelConfig.prefix_lm routes prefill onto the XLA attention path
with a full prompt mask, so engine greedy output equals HF generate
exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 120
BOS = 2


def tiny_paligemma():
    vc = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=48)
    tc = transformers.GemmaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=12,
        max_position_embeddings=128)
    # HF PaliGemmaConfig overwrites vision_config.projection_dim with its
    # own projection_dim kwarg (default 2048) - it must equal text hidden
    cfg = transformers.PaliGemmaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        projection_dim=48)
    cfg.architectures = ["PaliGemmaForConditionalGeneration"]
    m = transformers.PaliGemmaForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def paligemma():
    torch.manual_seed(30)
    return tiny_paligemma()


def test_prefix_lm_prefill_oracle():
    """prefill_attention(prefix_lm=True) == naive full-softmax attention
    with an all-visible prompt mask (and causality OFF inside the
    prompt)."""
    from kvcompress_tpu.ops.attention import prefill_attention

    rng = np.random.default_rng(0)
    T, Hq, Hkv, d, sl = 16, 4, 2, 8, 13
    q = rng.normal(size=(T, Hq, d)).astype(np.float32)
    k = rng.normal(size=(T, Hkv, d)).astype(np.float32)
    v = rng.normal(size=(T, Hkv, d)).astype(np.float32)
    scale = d ** -0.5
    out, metrics = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(sl, jnp.int32), scale, metric_window=8,
        buffer_len=0, use_l2=True, use_maxpool=False, prefix_lm=True)

    kr = np.repeat(k, Hq // Hkv, axis=1)
    vr = np.repeat(v, Hq // Hkv, axis=1)
    logits = np.einsum("qhd,khd->hqk", q, kr) * scale
    logits[:, :, sl:] = -1e30                      # only prompt keys
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("hqk,khd->qhd", probs, vr)
    np.testing.assert_allclose(np.asarray(out)[:sl], ref[:sl],
                               rtol=2e-5, atol=2e-5)
    # metrics exist for prompt keys only
    m = np.asarray(metrics)
    assert (m[sl:] == 0).all() and (m[:sl] > 0).any()


def test_vision_feature_parity(paligemma):
    """Our SigLIP tower + projector == HF get_image_features (HF divides
    by sqrt(D_text); ours returns the raw projector output because the
    engine splice happens after gemma's sqrt(D_text) embed scaling)."""
    m, cfg = paligemma
    torch.manual_seed(31)
    px = torch.randn(1, 3, 28, 28)
    with torch.no_grad():
        feats = m.get_image_features(pixel_values=px)
    if isinstance(feats, (list, tuple)):
        feats = feats[0]
    f = (feats[0] if feats.ndim == 3 else feats).numpy()
    f = f * cfg.text_config.hidden_size ** 0.5     # undo HF's divide

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    vcfg = V.config_from_hf(cfg.vision_config.to_dict(), cfg.to_dict())
    params = V.paligemma_params_from_hf(state, vcfg, dtype=jnp.float32)
    ours = np.asarray(V.paligemma_image_embed(
        params, vcfg, jnp.asarray(px[0].numpy())))
    assert ours.shape == (4, 48)
    np.testing.assert_allclose(ours, f, rtol=3e-5, atol=3e-5)


def test_engine_greedy_matches_hf(paligemma):
    """Engine e2e: registry gemma text tower with prefix_lm, SigLIP
    embeddings spliced at the placeholder positions - greedy output must
    equal HF PaliGemmaForConditionalGeneration.generate (which attends
    the whole prompt bidirectionally)."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = paligemma
    torch.manual_seed(32)
    px = torch.randn(1, 3, 28, 28)
    n_patch = 4
    # paligemma prompt format: image tokens, then bos + text prefix
    prompt = [IMG_TOK] * n_patch + [BOS, 5, 9, 7, 11]
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([prompt]),
                            pixel_values=px, max_new_tokens=6,
                            do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg.to_dict())
    assert mcfg.architecture == "PaliGemmaForConditionalGeneration"
    assert mcfg.prefix_lm and mcfg.image_token_index == IMG_TOK
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    vcfg = V.config_from_hf(cfg.vision_config.to_dict(), cfg.to_dict())
    vparams = V.paligemma_params_from_hf(state, vcfg, dtype=jnp.float32)
    embeds = V.paligemma_image_embed(vparams, vcfg,
                                     jnp.asarray(px[0].numpy()))
    positions = np.arange(n_patch, dtype=np.int32)

    ecfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(compression_interval=4,
                                    max_kv_per_compression=65536,
                                    max_cache_moves_per_compression=4096),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64,
                                  prefill_buckets=(16, 32)),
        parallel=ParallelConfig(),
    )

    def run(model_cfg):
        ec = EngineConfig(model=model_cfg, cache=ecfg.cache,
                          kvcompress=ecfg.kvcompress,
                          scheduler=ecfg.scheduler, parallel=ecfg.parallel)
        eng = LLMEngine(ec, params, num_blocks=256, attn_impl="xla")
        eng.add_request("0", prompt_token_ids=prompt,
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=6,
                            ignore_eos=True),
                        mm_embeds=embeds, mm_positions=positions)
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                outs[o.request_id] = o
        return outs["0"].outputs[0].token_ids

    got = run(mcfg)
    assert got == ref, (got, ref)

    # the bidirectional prefix must be load-bearing, not a no-op: the
    # prompt's last-token logits under causal vs prefix-LM masking differ
    # (a tiny random model can still sample the same argmax either way,
    # so compare logits, not generations)
    from kvcompress_tpu.ops.attention import prefill_attention
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(8, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(8, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(8, 2, 8)), jnp.float32)
    sl = jnp.asarray(8, jnp.int32)
    out_c, _ = prefill_attention(q, k, v, sl, 0.35, prefix_lm=False)
    out_p, _ = prefill_attention(q, k, v, sl, 0.35, prefix_lm=True)
    assert not np.allclose(np.asarray(out_c)[0], np.asarray(out_p)[0])
    # and the LAST query row (which already sees everything causally)
    # agrees between the two maskings
    np.testing.assert_allclose(np.asarray(out_c)[7], np.asarray(out_p)[7],
                               rtol=1e-5, atol=1e-5)


def test_llm_surface_paligemma_checkpoint(tmp_path, paligemma):
    """Full user path: paligemma checkpoint on disk, LLM() loads the
    SigLIP tower via load_multimodal, generate(multi_modal_data=...)
    encodes + expands the placeholder, output equals HF generate."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = paligemma
    d = str(tmp_path / "pg_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["PaliGemmaForConditionalGeneration"]
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    vocab = {f"w{i:03d}": i for i in range(128)}
    for j, w in enumerate(["hello", "what", "is", "this"]):
        del vocab[f"w{j + 20:03d}"]
        vocab[w] = j + 20
    del vocab[f"w{IMG_TOK:03d}"]
    vocab["<image>"] = IMG_TOK
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w001"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w001",
                                   pad_token="w000")
    fast.save_pretrained(d)

    torch.manual_seed(31)
    px = torch.randn(3, 28, 28)
    prompt = "<image> hello what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([IMG_TOK] * 4 if tok == IMG_TOK else [tok])
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([expanded]),
                            pixel_values=px[None], max_new_tokens=6,
                            do_sample=False)
    ref = hf_out[0, len(expanded):].tolist()

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "paligemma"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
