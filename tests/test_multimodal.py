"""Multimodal (LLaVA): CLIP vision tower + projector parity vs HF, image
placeholder expansion, and engine greedy parity with image embeddings
scattered into the prompt (reference vllm/model_executor/models/llava.py,
clip.py; vllm/multimodal/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 127


def tiny_llava():
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    # fresh configs leave architectures unset; checkpoints always carry it
    cfg.architectures = ["LlavaForConditionalGeneration"]
    m = transformers.LlavaForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def llava():
    torch.manual_seed(0)
    return tiny_llava()


def test_vision_tower_parity(llava):
    m, cfg = llava
    torch.manual_seed(1)
    px = torch.randn(1, 3, 28, 28)
    with torch.no_grad():
        feats = m.get_image_features(pixel_values=px)
    if isinstance(feats, (list, tuple)):
        feats = feats[0]
    f = feats.numpy() if feats.ndim == 2 else feats[0].numpy()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    vcfg = V.config_from_hf(cfg.vision_config.to_dict(), cfg.to_dict())
    params = V.params_from_hf(state, vcfg, dtype=jnp.float32)
    ours = np.asarray(V.llava_image_embed(
        params, vcfg, jnp.asarray(px[0].numpy())))
    assert vcfg.num_patches == 4
    np.testing.assert_allclose(ours, f, rtol=2e-5, atol=2e-5)


def test_expand_image_tokens():
    ids, pos = V.expand_image_tokens([5, IMG_TOK, 9, IMG_TOK, 3],
                                     IMG_TOK, 3)
    assert ids == [5] + [IMG_TOK] * 3 + [9] + [IMG_TOK] * 3 + [3]
    np.testing.assert_array_equal(pos, [1, 2, 3, 5, 6, 7])


def test_engine_greedy_matches_hf_with_image(llava):
    """Full path: registry loads the llava text tower, the engine
    scatters projected image embeddings at the placeholder positions, and
    greedy output equals HF LlavaForConditionalGeneration.generate."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = llava
    torch.manual_seed(2)
    px = torch.randn(1, 3, 28, 28)
    n_patch = 4
    prompt = [1, 5, 9] + [IMG_TOK] * n_patch + [7, 11, 2, 9]
    input_ids = torch.tensor([prompt])
    with torch.no_grad():
        hf_out = m.generate(input_ids=input_ids, pixel_values=px,
                            max_new_tokens=6, do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg.to_dict())
    assert mcfg.architecture == "LlavaForConditionalGeneration"
    assert mcfg.image_token_index == IMG_TOK
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    vcfg = V.config_from_hf(cfg.vision_config.to_dict(), cfg.to_dict())
    vparams = V.params_from_hf(state, vcfg, dtype=jnp.float32)
    embeds = V.llava_image_embed(vparams, vcfg,
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

    # and WITHOUT the image embeddings the output must differ (the splice
    # is actually doing something)
    eng2 = LLMEngine(ecfg, params, num_blocks=256, attn_impl="xla")
    eng2.add_request("0", prompt_token_ids=prompt,
                     sampling_params=SamplingParams(
                         temperature=0.0, max_tokens=6, ignore_eos=True))
    outs2 = {}
    while eng2.has_unfinished_requests():
        for o in eng2.step():
            outs2[o.request_id] = o
    assert outs2["0"].outputs[0].token_ids != ref


# ------------------------------------------------------------ llava-next
def tiny_llava_next():
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaNextConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]],
        projector_hidden_act="gelu")
    cfg.architectures = ["LlavaNextForConditionalGeneration"]
    m = transformers.LlavaNextForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def llava_next():
    torch.manual_seed(10)
    return tiny_llava_next()


def test_anyres_helpers_match_transformers():
    from transformers.models.llava_next.image_processing_llava_next import (
        select_best_resolution)
    from transformers.models.llava_next.modeling_llava_next import (
        unpad_image)
    rng = np.random.default_rng(11)
    pinpoints = [[28, 56], [56, 28], [56, 56], [84, 28]]
    for _ in range(20):
        hw = (int(rng.integers(10, 120)), int(rng.integers(10, 120)))
        assert tuple(select_best_resolution(hw, pinpoints)) == \
            V.select_best_resolution(hw, pinpoints), hw
    for _ in range(10):
        hw = (int(rng.integers(10, 120)), int(rng.integers(10, 120)))
        x = rng.normal(size=(5, 4, 6)).astype(np.float32)
        np.testing.assert_array_equal(
            unpad_image(torch.tensor(x), hw).numpy(), V._unpad_hw(x, hw))


def test_llava_next_engine_matches_hf(llava_next):
    """AnyRes path end to end: tile the image like the HF processor
    (base resize + best-resolution grid), merge with spatial_unpad +
    image_newline, splice into the engine - greedy output must equal HF
    LlavaNextForConditionalGeneration.generate."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = llava_next
    torch.manual_seed(12)
    image_size = (40, 56)  # (h, w): best pinpoint (56, 56) -> 2x2 grid
    n_tiles = 5            # base + 4 crops
    px = torch.randn(1, n_tiles, 3, 28, 28)

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    vcfg = V.config_from_hf(cfg.vision_config.to_dict(), cfg.to_dict())
    assert vcfg.grid_pinpoints == ((28, 56), (56, 28), (56, 56))
    vparams = V.params_from_hf(state, vcfg, dtype=jnp.float32)
    assert "image_newline" in vparams
    embeds = V.llava_next_image_embed(
        vparams, vcfg, jnp.asarray(px[0].numpy()), image_size,
        vcfg.grid_pinpoints)
    n_feat = embeds.shape[0]
    # base 2x2=4, grid 4x4 unpadded to 2 rows x (4+newline) = 10
    assert n_feat == 14, n_feat

    prompt = [1, 5, 9] + [IMG_TOK] * n_feat + [7, 11, 2, 9]
    with torch.no_grad():
        hf_out = m.generate(
            input_ids=torch.tensor([prompt]), pixel_values=px,
            image_sizes=torch.tensor([list(image_size)]),
            max_new_tokens=6, do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    mcfg = config_from_hf(cfg.to_dict())
    assert mcfg.architecture == "LlavaNextForConditionalGeneration"
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    positions = np.asarray([i for i, t in enumerate(prompt)
                            if t == IMG_TOK], np.int32)
    ecfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(compression_interval=4,
                                    max_kv_per_compression=65536,
                                    max_cache_moves_per_compression=4096),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64,
                                  prefill_buckets=(32,)),
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


def test_llm_surface_with_image_checkpoint(tmp_path, llava):
    """Full user path: llava checkpoint on disk (config + safetensors +
    tokenizer with an <image> token), LLM(model=...) loads text tower AND
    vision tower, generate(multi_modal_data=...) encodes the image,
    expands the placeholder, and matches HF generate."""
    import json
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = llava
    d = str(tmp_path / "llava_ck")
    import os
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["LlavaForConditionalGeneration"]
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    # word-level tokenizer: a few words + the <image> placeholder at the
    # configured image_token_index
    words = ["hello", "world", "what", "is", "this"]
    vocab = {f"w{i:03d}": i for i in range(128)}
    for j, w in enumerate(words):
        del vocab[f"w{j + 20:03d}"]
        vocab[w] = j + 20
    del vocab[f"w{IMG_TOK:03d}"]
    vocab["<image>"] = IMG_TOK
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w001"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w001",
                                   pad_token="w000")
    fast.save_pretrained(d)

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None

    torch.manual_seed(5)
    px = torch.randn(3, 28, 28)
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    n_patch = 4
    expanded = []
    for tok_ in ids:
        expanded.extend([IMG_TOK] * n_patch if tok_ == IMG_TOK else [tok_])
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([expanded]),
                            pixel_values=px[None], max_new_tokens=5,
                            do_sample=False)
    ref = hf_out[0, len(expanded):].tolist()

    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref


def test_llm_surface_llava_next_checkpoint(tmp_path, llava_next):
    """Full user path for AnyRes: llava-next checkpoint on disk, LLM()
    loads both towers, generate(multi_modal_data={"image": tiles,
    "image_size": (h, w)}) expands the single <image> placeholder into
    the variable-length merged run and matches HF generate."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = llava_next
    d = str(tmp_path / "llava_next_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["LlavaNextForConditionalGeneration"]
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

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=96, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "llava_next"

    torch.manual_seed(13)
    image_size = (40, 56)  # best pinpoint (56, 56) -> 2x2 grid, 5 tiles
    px = torch.randn(5, 3, 28, 28)
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    # merged run: base 4 + unpadded grid 2x(4+newline) = 14 features
    expanded = []
    for tok_ in ids:
        expanded.extend([IMG_TOK] * 14 if tok_ == IMG_TOK else [tok_])
    with torch.no_grad():
        hf_out = m.generate(
            input_ids=torch.tensor([expanded]), pixel_values=px[None],
            image_sizes=torch.tensor([list(image_size)]),
            max_new_tokens=5, do_sample=False)
    ref = hf_out[0, len(expanded):].tolist()

    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy(),
                                           "image_size": image_size}])
    assert outs[0].outputs[0].token_ids == ref


def test_fuyu_engine_matches_hf():
    """Fuyu (decoder-only multimodal, reference fuyu.py): persimmon text
    tower + one linear over raw patches; engine greedy output with the
    patch embeddings spliced at the placeholder positions must equal HF
    FuyuForCausalLM.generate given the same image_patches."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.models.vision import (fuyu_image_embed,
                                              fuyu_params_from_hf)
    from kvcompress_tpu.sampling_params import SamplingParams

    cfg_hf = transformers.FuyuConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, patch_size=8,
        num_channels=3, max_position_embeddings=128, image_token_id=200)
    cfg_hf.architectures = ["FuyuForCausalLM"]
    torch.manual_seed(6)
    m = transformers.FuyuForCausalLM(cfg_hf).eval()

    n_patch = 6
    patches = torch.randn(1, n_patch, 8 * 8 * 3)
    placeholder = 200
    prompt = [5, 9] + [placeholder] * n_patch + [7, 11, 3]
    indices = torch.full((1, len(prompt)), -1, dtype=torch.long)
    for j in range(n_patch):
        indices[0, 2 + j] = j
    with torch.no_grad():
        hf_out = m.generate(input_ids=torch.tensor([prompt]),
                            image_patches=patches,
                            image_patches_indices=indices,
                            max_new_tokens=6, do_sample=False)
    ref = hf_out[0, len(prompt):].tolist()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg_hf.to_dict())
    assert mcfg.architecture == "FuyuForCausalLM"
    assert mcfg.image_token_index == 200
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    vparams = fuyu_params_from_hf(state, dtype=jnp.float32)
    embeds = fuyu_image_embed(vparams, jnp.asarray(patches[0].numpy()))
    positions = np.asarray([i for i, t in enumerate(prompt)
                            if t == placeholder], np.int32)

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
    assert outs["0"].outputs[0].token_ids == ref
