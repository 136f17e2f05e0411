"""Chameleon (reference vllm/model_executor/models/chameleon.py): VQ-VAE
image tokenizer parity, per-head qk-layernorm + swin-norm text parity,
and engine e2e where images enter as TEXT tokens (no embedding splice)."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V
from kvcompress_tpu.models.registry import (config_from_hf,
                                            params_from_hf_state)

IMG_TOK = 280          # <image> placeholder bpe id
N_EMB = 16             # tiny codebook
IMG_BPE0 = 256         # image bpe ids 256..271


def _vocab_map():
    m = {"<image>": IMG_TOK}
    for i in range(N_EMB):
        name = "IMGIMG" + "".join(chr(ord("A") + int(c))
                                  for c in str(i)) + "Z"
        m[name] = IMG_BPE0 + i
    return m


def tiny_chameleon(swin=False):
    vq = dict(embed_dim=8, num_embeddings=N_EMB, base_channels=32,
              channel_multiplier=[1, 2], num_res_blocks=1,
              attn_resolutions=[8], resolution=16, latent_channels=8,
              in_channels=3, double_latent=False, attn_type="vanilla")
    cfg = transformers.ChameleonConfig(
        vocab_size=300, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        vq_config=vq, vocabulary_map=_vocab_map(), swin_norm=swin)
    cfg.architectures = ["ChameleonForConditionalGeneration"]
    m = transformers.ChameleonForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def chameleon():
    torch.manual_seed(40)
    return tiny_chameleon()


def test_vq_tokenizer_parity(chameleon):
    """Our JAX VQ-VAE encoder maps an image to the same BPE token run as
    HF ChameleonModel.get_image_tokens (encoder -> quant_conv -> nearest
    codebook -> img2bpe)."""
    m, cfg = chameleon
    torch.manual_seed(41)
    px = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        ref = m.model.get_image_tokens(px)[0].numpy()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    vqcfg = V.chameleon_vq_config_from_hf(cfg.to_dict())
    params = V.chameleon_vq_params_from_hf(state, vqcfg, dtype=jnp.float32)
    img2bpe = V.chameleon_img2bpe(cfg.vocabulary_map)
    ours = V.chameleon_image_tokens(params, vqcfg, img2bpe,
                                    jnp.asarray(px[0].numpy()))
    assert ours.shape == (64,)           # 16x16 -> one downsample -> 8x8
    np.testing.assert_array_equal(ours, ref)
    assert set(int(x) for x in ours) <= set(range(IMG_BPE0,
                                                  IMG_BPE0 + N_EMB))


@pytest.mark.parametrize("swin", [False, True])
def test_text_parity(swin):
    """Per-head qk-layernorm (and swin norm-after-sublayer ordering for
    the 30B variant) match HF logits - including the image-token logit
    suppression both sides apply."""
    from kvcompress_tpu.models import decoder as D
    from kvcompress_tpu.models.decoder import AttentionSpec
    from tests.test_llama_parity import (build_cache_and_tables,
                                         make_prefill_slot_map)

    torch.manual_seed(42 + swin)
    m, hf_cfg = tiny_chameleon(swin=swin)
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    assert cfg.qk_norm_per_head
    assert cfg.no_pre_norm == swin and cfg.use_post_norms == swin
    assert cfg.logit_suppress_tokens == tuple(range(IMG_BPE0,
                                                    IMG_BPE0 + N_EMB))
    params = params_from_hf_state(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=11).tolist()
    with torch.no_grad():
        hf_logits = m(torch.tensor([prompt])).logits[0, -1].float().numpy()

    T_pad = 16
    cache, bt, bs = build_cache_and_tables(cfg, len(prompt) + 1)
    tokens = np.zeros(T_pad, np.int32)
    tokens[:len(prompt)] = prompt
    slot_map = make_prefill_slot_map(bt[:, 0], len(prompt), T_pad, bs)
    last_hidden, _ = D.prefill(
        params, cfg, jnp.asarray(tokens), jnp.asarray(len(prompt)),
        jnp.asarray(slot_map), cache, jnp.asarray(0),
        AttentionSpec(mode="prefill"))
    logits = np.asarray(D.compute_logits(params, cfg, last_hidden))
    sup = np.asarray(cfg.logit_suppress_tokens)
    assert (logits[sup] == np.finfo(np.float32).min).all()
    keep = np.setdiff1d(np.arange(300), sup)
    np.testing.assert_allclose(logits[keep], hf_logits[keep],
                               rtol=3e-3, atol=3e-3)


def test_engine_greedy_matches_hf_with_image(chameleon):
    """E2e: the image tokenizes to text ids, the engine serves the
    resulting pure-text prompt, greedy output equals HF generate with
    pixel_values."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = chameleon
    torch.manual_seed(43)
    px = torch.randn(1, 3, 16, 16)
    prompt = [1, 5] + [IMG_TOK] * 64 + [7, 9]
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([prompt]),
                            pixel_values=px, max_new_tokens=6,
                            do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg.to_dict())
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    vqcfg = V.chameleon_vq_config_from_hf(cfg.to_dict())
    vparams = V.chameleon_vq_params_from_hf(state, vqcfg,
                                            dtype=jnp.float32)
    img2bpe = V.chameleon_img2bpe(cfg.vocabulary_map)
    run = V.chameleon_image_tokens(vparams, vqcfg, img2bpe,
                                   jnp.asarray(px[0].numpy()))
    text_prompt = [1, 5] + [int(x) for x in run] + [7, 9]

    ecfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(compression_interval=4,
                                    max_kv_per_compression=65536,
                                    max_cache_moves_per_compression=4096),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_buckets=(128,)),
        parallel=ParallelConfig(),
    )
    eng = LLMEngine(ecfg, params, num_blocks=512, attn_impl="xla")
    eng.add_request("0", prompt_token_ids=text_prompt,
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=6, ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    got = outs["0"].outputs[0].token_ids
    assert got == ref, (got, ref)
    # image-codebook ids are suppressed at every sampled step
    assert not (set(got) & set(range(IMG_BPE0, IMG_BPE0 + N_EMB)))


def test_llm_surface_chameleon_checkpoint(tmp_path, chameleon):
    """Full user path: chameleon checkpoint on disk, LLM() loads the
    VQ tokenizer via load_multimodal, generate(multi_modal_data=...)
    replaces the <image> placeholder with the token run, output equals
    HF generate."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = chameleon
    d = str(tmp_path / "cham_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["ChameleonForConditionalGeneration"]
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    vocab = {f"w{i:03d}": i for i in range(300)}
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

    torch.manual_seed(44)
    px = torch.randn(3, 16, 16)
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([IMG_TOK] * 64 if tok == IMG_TOK else [tok])
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([expanded]),
                            pixel_values=px[None], max_new_tokens=5,
                            do_sample=False)
    ref = hf_out[0, len(expanded):].tolist()

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=512, max_num_seqs=2,
              max_model_len=128, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "chameleon"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
