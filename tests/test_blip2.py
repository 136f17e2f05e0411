"""BLIP-2: Blip2 vision tower + Q-Former + language projection parity vs
HF, and engine greedy parity with the projected query embeddings spliced
into the prompt (reference vllm/model_executor/models/blip2.py). The
reference PREPENDS the query embeddings to the text embeds; we expand
`num_query_tokens` placeholders at the front instead - identical
positions, identical math under causal attention."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 1  # OPT pad token doubles as the placeholder id
NQ = 8


def tiny_blip2():
    vc = transformers.Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)
    qc = transformers.Blip2QFormerConfig(
        hidden_size=24, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=48, encoder_hidden_size=32,
        cross_attention_frequency=2)
    tc = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=48)
    cfg = transformers.Blip2Config(
        vision_config=vc.to_dict(), qformer_config=qc.to_dict(),
        text_config=tc.to_dict(), num_query_tokens=NQ)
    cfg.architectures = ["Blip2ForConditionalGeneration"]
    m = transformers.Blip2ForConditionalGeneration(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def blip2():
    torch.manual_seed(0)
    return tiny_blip2()


def _hf_image_inputs(m, px):
    """HF oracle for the projected query embeddings (the language-model
    inputs the reference prepends)."""
    with torch.no_grad():
        feats = m.vision_model(px).last_hidden_state          # [1, N, Dv]
        q = m.query_tokens.expand(1, -1, -1)
        qf = m.qformer(query_embeds=q, encoder_hidden_states=feats)
        return m.language_projection(qf.last_hidden_state)[0]  # [NQ, Dt]


def test_blip2_image_embed_parity(blip2):
    m, cfg = blip2
    torch.manual_seed(1)
    px = torch.randn(1, 3, 28, 28)
    ref = _hf_image_inputs(m, px).numpy()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    bcfg = V.blip2_config_from_hf(cfg.to_dict())
    assert bcfg.num_query_tokens == NQ
    params = V.blip2_params_from_hf(state, bcfg, dtype=jnp.float32)
    ours = np.asarray(V.blip2_image_embed(params, bcfg,
                                          jnp.asarray(px[0].numpy())))
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


def test_blip2_engine_greedy_matches_hf(blip2):
    """Engine greedy with the query embeddings spliced at the leading
    placeholder positions equals HF greedy over the prepended embeds."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.registry import (config_from_hf,
                                                params_from_hf_state)
    from kvcompress_tpu.sampling_params import SamplingParams

    m, cfg = blip2
    torch.manual_seed(2)
    px = torch.randn(1, 3, 28, 28)
    text = [2, 7, 11, 9, 5]
    img_inputs = _hf_image_inputs(m, px)

    with torch.no_grad():
        text_emb = m.language_model.get_input_embeddings()(
            torch.tensor([text]))
        inputs_embeds = torch.cat([img_inputs[None], text_emb], dim=1)
        hf_out = m.language_model.generate(
            inputs_embeds=inputs_embeds, max_new_tokens=6,
            do_sample=False)
    ref = hf_out[0].tolist()
    if ref and ref[0] == m.config.text_config.bos_token_id \
            and len(ref) == 7:
        ref = ref[1:]  # some HF versions prepend BOS to the output ids

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    mcfg = config_from_hf(cfg.to_dict())
    assert mcfg.architecture == "Blip2ForConditionalGeneration"
    params = params_from_hf_state(state, mcfg, dtype=jnp.float32)
    bcfg = V.blip2_config_from_hf(cfg.to_dict())
    vparams = V.blip2_params_from_hf(state, bcfg, dtype=jnp.float32)
    embeds = V.blip2_image_embed(vparams, bcfg, jnp.asarray(px[0].numpy()))

    prompt = [IMG_TOK] * NQ + text
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
                    mm_embeds=embeds,
                    mm_positions=np.arange(NQ, dtype=np.int32))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    got = outs["0"].outputs[0].token_ids
    assert got == ref, (got, ref)


def test_llm_surface_blip2_checkpoint(tmp_path, blip2):
    """Full user path: blip2 checkpoint on disk (config + safetensors +
    tokenizer with an <image> token at image_token_index), LLM(model=...)
    loads the OPT text tower AND the blip2 vision/Q-Former side,
    generate(multi_modal_data=...) expands one <image> placeholder into
    num_query_tokens positions and matches the HF prepended-embeds
    greedy."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    m, cfg = blip2
    d = str(tmp_path / "blip2_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["Blip2ForConditionalGeneration"]
    hf_cfg["image_token_index"] = IMG_TOK
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    words = ["hello", "what", "is", "this"]
    vocab = {f"w{i:03d}": i for i in range(128)}
    for j, w in enumerate(words):
        del vocab[f"w{j + 20:03d}"]
        vocab[w] = j + 20
    del vocab[f"w{IMG_TOK:03d}"]
    vocab["<image>"] = IMG_TOK
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w002"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w002",
                                   pad_token="w000")
    fast.save_pretrained(d)

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "blip2"

    torch.manual_seed(5)
    px = torch.randn(3, 28, 28)
    prompt = "<image> hello what is this"
    text_ids = [i for i in fast.encode(prompt) if i != IMG_TOK]
    img_inputs = _hf_image_inputs(m, px[None])
    with torch.no_grad():
        text_emb = m.language_model.get_input_embeddings()(
            torch.tensor([text_ids]))
        hf_out = m.language_model.generate(
            inputs_embeds=torch.cat([img_inputs[None], text_emb], dim=1),
            max_new_tokens=5, do_sample=False)
    ref = hf_out[0].tolist()
    if ref and ref[0] == m.config.text_config.bos_token_id \
            and len(ref) == 6:
        ref = ref[1:]

    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
