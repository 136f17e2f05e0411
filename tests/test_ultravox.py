"""Ultravox (reference vllm/model_executor/models/ultravox.py): the
audio modality. Whisper-encoder parity vs HF, projector parity vs an
independent torch oracle, and the full LLM-surface path on an on-disk
checkpoint vs an HF-composed reference (whisper -> projector -> llama
inputs_embeds generate)."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

AUD_TOK = 120
SF = 8  # stack factor


def tiny_whisper_cfg():
    return transformers.WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=32,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=64,
        max_target_positions=32, vocab_size=64, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None)


def _audio_tower_state(whisper):
    """WhisperModel state dict -> ultravox audio_tower.* names."""
    return {k.replace("encoder.", "audio_tower.", 1): v
            for k, v in whisper.state_dict().items()
            if k.startswith("encoder.")}


def test_whisper_encoder_parity():
    torch.manual_seed(60)
    wcfg = tiny_whisper_cfg()
    whisper = transformers.WhisperModel(wcfg).eval()
    torch.manual_seed(61)
    mel = torch.randn(1, 16, 64)   # max_source_positions * 2 frames
    with torch.no_grad():
        ref = whisper.encoder(mel).last_hidden_state[0].numpy()

    state = {k: v.detach().numpy()
             for k, v in _audio_tower_state(whisper).items()}
    cfg = V.UltravoxAudioCfg(
        d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        num_mel_bins=16, max_source_positions=32, stack_factor=SF)
    params = V.ultravox_params_from_hf(
        {**state,
         # projector placeholders (unused by the encoder test)
         "multi_modal_projector.ln_pre.weight": np.ones(32 * SF,
                                                        np.float32),
         "multi_modal_projector.linear_1.weight": np.zeros((64, 32 * SF),
                                                           np.float32),
         "multi_modal_projector.linear_2.weight": np.zeros((48, 32),
                                                           np.float32),
         "multi_modal_projector.ln_post.weight": np.ones(48, np.float32)},
        cfg, dtype=jnp.float32)
    ours = np.asarray(V.whisper_encoder_forward(
        params["audio"], cfg, jnp.asarray(mel[0].numpy())))
    assert ours.shape == (32, 32)
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


def _torch_projector(feats, ln_pre, w1, w2, ln_post, sf=SF):
    """Independent torch oracle for the reference UltravoxProjector
    (ultravox.py:191-251): pad+stack -> RMSNorm -> linear -> FLIPPED
    SwiGLU -> linear -> RMSNorm."""
    T, C = feats.shape
    T_pad = -(-T // sf) * sf
    x = torch.nn.functional.pad(feats, (0, 0, 0, T_pad - T))
    x = x.view(T_pad // sf, C * sf)

    def rms(x, w):
        v = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + 1e-6) * w

    x = rms(x, ln_pre)
    x = x @ w1.T
    a, b = x.chunk(2, dim=-1)
    x = torch.nn.functional.silu(b) * a
    x = x @ w2.T
    return rms(x, ln_post)


def test_projector_parity():
    torch.manual_seed(62)
    feats = torch.randn(30, 32)    # deliberately NOT a stack multiple
    ln_pre = torch.randn(32 * SF).abs() + 0.5
    w1 = torch.randn(64, 32 * SF) * 0.05
    w2 = torch.randn(48, 32) * 0.05
    ln_post = torch.randn(48).abs() + 0.5
    ref = _torch_projector(feats, ln_pre, w1, w2, ln_post).numpy()

    pj = {"ln_pre": jnp.asarray(ln_pre.numpy()),
          "w1": jnp.asarray(w1.numpy().T),
          "w2": jnp.asarray(w2.numpy().T),
          "ln_post": jnp.asarray(ln_post.numpy())}
    # drive just the projector half: reuse ultravox_audio_embed's tail by
    # feeding identity through a fake encoder is awkward - replicate the
    # stack+project steps directly
    sf = SF
    T, C = feats.shape
    T_pad = -(-T // sf) * sf
    x = jnp.pad(jnp.asarray(feats.numpy()), ((0, T_pad - T), (0, 0)))
    x = x.reshape(T_pad // sf, C * sf)
    import jax
    y = V._rms(x, pj["ln_pre"])
    y = y @ pj["w1"]
    a, b = jnp.split(y, 2, axis=-1)
    y = jax.nn.silu(b) * a
    y = y @ pj["w2"]
    ours = np.asarray(V._rms(y, pj["ln_post"]))
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


def test_llm_surface_ultravox_checkpoint(tmp_path):
    """Full audio path: ultravox checkpoint on disk (whisper audio tower
    + llama text tower + projector), LLM() loads it, and
    generate(multi_modal_data={"audio_features": mel}) matches an
    HF-composed reference (whisper encoder -> oracle projector -> llama
    generate over spliced inputs_embeds)."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(63)
    wcfg = tiny_whisper_cfg()
    whisper = transformers.WhisperModel(wcfg).eval()
    tc = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    tc.architectures = ["LlamaForCausalLM"]
    llama = transformers.LlamaForCausalLM(tc).eval()
    ln_pre = (torch.randn(32 * SF).abs() + 0.5)
    w1 = torch.randn(64, 32 * SF) * 0.05
    w2 = torch.randn(48, 32) * 0.05
    ln_post = (torch.randn(48).abs() + 0.5)

    d = str(tmp_path / "uv_ck")
    os.makedirs(d)
    hf_cfg = {
        "architectures": ["UltravoxModel"], "model_type": "ultravox",
        "audio_config": wcfg.to_dict(), "text_config": tc.to_dict(),
        "stack_factor": SF, "projector_act": "swiglu",
        "audio_token_index": AUD_TOK, "hidden_size": 64,
    }
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    tensors = dict(_audio_tower_state(whisper))
    tensors.update({
        "multi_modal_projector.ln_pre.weight": ln_pre,
        "multi_modal_projector.linear_1.weight": w1,
        "multi_modal_projector.linear_2.weight": w2,
        "multi_modal_projector.ln_post.weight": ln_post,
    })
    tensors.update({f"language_model.{k}": v
                    for k, v in llama.state_dict().items()})
    save_file({k: v.clone().contiguous() for k, v in tensors.items()},
              f"{d}/model.safetensors")
    vocab = {f"w{i:03d}": i for i in range(128)}
    for j, w in enumerate(["hello", "what", "is", "this"]):
        del vocab[f"w{j + 20:03d}"]
        vocab[w] = j + 20
    del vocab[f"w{AUD_TOK:03d}"]
    vocab["<|audio|>"] = AUD_TOK
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w001"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w001",
                                   pad_token="w000")
    fast.save_pretrained(d)

    torch.manual_seed(64)
    mel = torch.randn(16, 64)
    # composed HF reference: encoder -> oracle projector -> splice into
    # the llama embedding stream -> greedy generate
    with torch.no_grad():
        enc = whisper.encoder(mel[None]).last_hidden_state[0]
        audio_embeds = _torch_projector(enc, ln_pre, w1, w2, ln_post)
    n_tok = audio_embeds.shape[0]
    assert n_tok == 4                       # 32 frames / stack 8
    prompt = "hello <|audio|> what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([AUD_TOK] * n_tok if tok == AUD_TOK else [tok])
    with torch.no_grad():
        emb = llama.get_input_embeddings()(torch.tensor([expanded]))
        pos = [i for i, tok in enumerate(expanded) if tok == AUD_TOK]
        emb[0, pos] = audio_embeds
        hf_out = llama.generate(inputs_embeds=emb, max_new_tokens=5,
                                do_sample=False)
    ref = hf_out[0].tolist()                # inputs_embeds: only new ids

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "ultravox"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[
                            {"audio_features": mel.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
