"""InternVL (reference vllm/model_executor/models/internvl.py +
intern_vit.py): InternViT tower + pixel-shuffle + MLP projector parity vs
HF InternVLForConditionalGeneration, and engine greedy e2e."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 120


def tiny_internvl(use_qk_norm=False, norm_type="layer_norm"):
    vc = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=[56, 56], patch_size=[14, 14],
        use_qk_norm=use_qk_norm, norm_type=norm_type,
        use_absolute_position_embeddings=True)
    tc = transformers.Qwen2Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.InternVLConfig(
        vision_config=vc, text_config=tc, image_token_id=IMG_TOK,
        downsample_ratio=0.5)
    cfg.architectures = ["InternVLForConditionalGeneration"]
    m = transformers.InternVLForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def internvl():
    torch.manual_seed(50)
    return tiny_internvl()


@pytest.mark.parametrize("use_qk_norm,norm_type",
                         [(False, "layer_norm"), (True, "rms_norm")])
def test_image_feature_parity(use_qk_norm, norm_type):
    """Our InternViT (+layer scale, optional full-dim RMS qk-norm,
    rms/layer norm variants) + pixel shuffle + projector == HF
    get_image_features."""
    torch.manual_seed(51 + use_qk_norm)
    m, cfg = tiny_internvl(use_qk_norm=use_qk_norm, norm_type=norm_type)
    px = torch.randn(1, 3, 56, 56)
    with torch.no_grad():
        feats = m.get_image_features(pixel_values=px)
    if isinstance(feats, (list, tuple)):
        feats = feats[0]
    f = (feats[0] if feats.ndim == 3 else feats).numpy()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    ivcfg = V.internvl_config_from_hf(cfg.to_dict())
    assert ivcfg.use_qk_norm == use_qk_norm
    params = V.internvl_params_from_hf(state, ivcfg, dtype=jnp.float32)
    ours = np.asarray(V.internvl_image_embed(
        params, ivcfg, jnp.asarray(px[0].numpy())))
    # 4x4 patch grid, 0.5 shuffle -> 2x2 = 4 tokens in text space
    assert ours.shape == (4, 48)
    np.testing.assert_allclose(ours, f, rtol=3e-5, atol=3e-5)


def test_engine_greedy_matches_hf(internvl):
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = internvl
    torch.manual_seed(52)
    px = torch.randn(1, 3, 56, 56)
    prompt = [1, 5, 9] + [IMG_TOK] * 4 + [7, 11]
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([prompt]),
                            pixel_values=px, max_new_tokens=6,
                            do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg.to_dict())
    assert mcfg.architecture == "InternVLForConditionalGeneration"
    assert mcfg.image_token_index == IMG_TOK
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    ivcfg = V.internvl_config_from_hf(cfg.to_dict())
    vparams = V.internvl_params_from_hf(state, ivcfg, dtype=jnp.float32)
    embeds = V.internvl_image_embed(vparams, ivcfg,
                                    jnp.asarray(px[0].numpy()))
    positions = np.asarray([i for i, t in enumerate(prompt)
                            if t == IMG_TOK], np.int32)

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
    eng = LLMEngine(ecfg, params, num_blocks=256, attn_impl="xla")
    eng.add_request("0", prompt_token_ids=prompt,
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=6, ignore_eos=True),
                    mm_embeds=embeds, mm_positions=positions)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    got = outs["0"].outputs[0].token_ids
    assert got == ref, (got, ref)


def test_llm_surface_internvl_checkpoint(tmp_path, internvl):
    """Full user path: internvl checkpoint on disk, LLM() loads the
    InternViT tower via load_multimodal, generate(multi_modal_data=...)
    matches HF generate."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = internvl
    d = str(tmp_path / "ivl_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["InternVLForConditionalGeneration"]
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

    torch.manual_seed(53)
    px = torch.randn(3, 56, 56)
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([IMG_TOK] * 4 if tok == IMG_TOK else [tok])
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([expanded]),
                            pixel_values=px[None], max_new_tokens=5,
                            do_sample=False)
    ref = hf_out[0, len(expanded):].tolist()

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "internvl"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
