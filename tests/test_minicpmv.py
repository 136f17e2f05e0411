"""MiniCPM-V (reference vllm/model_executor/models/minicpmv.py):
resampler parity vs a torch nn.MultiheadAttention oracle, 2D sincos
position parity vs a direct-formula oracle, and the LLM-surface path on
an on-disk checkpoint vs an HF-composed reference."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 120
QN = 3      # query_num
NH = 4      # resampler heads


def test_pos_2d_direct_formula():
    """Element-by-element check of the MAE 2.5 sincos layout: first half
    encodes the W coordinate, second half the H coordinate (the
    reference's grid[0]/grid[1] quirk), each as [sin(p*w), cos(p*w)]."""
    D = 16
    pos = V.minicpmv_pos_2d(D, 3, 5)
    assert pos.shape == (3, 5, D)
    q = D // 4
    for (h, w) in [(0, 0), (2, 4), (1, 3)]:
        for j in range(q):
            om = 1.0 / 10000 ** (j / q)
            assert math.isclose(pos[h, w, j], math.sin(w * om),
                                rel_tol=1e-6, abs_tol=1e-6)
            assert math.isclose(pos[h, w, q + j], math.cos(w * om),
                                rel_tol=1e-6, abs_tol=1e-6)
            assert math.isclose(pos[h, w, 2 * q + j], math.sin(h * om),
                                rel_tol=1e-6, abs_tol=1e-6)
            assert math.isclose(pos[h, w, 3 * q + j], math.cos(h * om),
                                rel_tol=1e-6, abs_tol=1e-6)


def _torch_resampler(feats, tgt_hw, p):
    """Independent torch oracle for Resampler2_5.forward using the real
    torch nn.MultiheadAttention (reference minicpmv.py:304-392)."""
    D = p["query"].shape[1]
    attn = torch.nn.MultiheadAttention(D, NH)
    with torch.no_grad():
        attn.in_proj_weight.copy_(p["in_proj_w"])
        attn.in_proj_bias.copy_(p["in_proj_b"])
        attn.out_proj.weight.copy_(p["out_w"])
        attn.out_proj.bias.copy_(p["out_b"])

    def ln(x, w, b):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],), w, b)

    h, w = tgt_hw
    pos = torch.tensor(V.minicpmv_pos_2d(D, h, w).reshape(-1, D),
                       dtype=torch.float32)
    kv = ln(feats @ p["kv_w"].T, p["ln_kv"], p["ln_kv_b"])
    q = ln(p["query"], p["ln_q"], p["ln_q_b"])
    with torch.no_grad():
        out = attn(q.unsqueeze(1), (kv + pos).unsqueeze(1),
                   kv.unsqueeze(1))[0].squeeze(1)
    out = ln(out, p["ln_post"], p["ln_post_b"])
    return out @ p["proj"]


def _rand_resampler_params(kv_dim=32, D=48, text=48):
    torch.manual_seed(80)
    return {
        "query": torch.randn(QN, D) * 0.2,
        "kv_w": torch.randn(D, kv_dim) * 0.1,
        "ln_q": torch.randn(D).abs() + 0.5,
        "ln_q_b": torch.randn(D) * 0.05,
        "ln_kv": torch.randn(D).abs() + 0.5,
        "ln_kv_b": torch.randn(D) * 0.05,
        "ln_post": torch.randn(D).abs() + 0.5,
        "ln_post_b": torch.randn(D) * 0.05,
        "in_proj_w": torch.randn(3 * D, D) * 0.1,
        "in_proj_b": torch.randn(3 * D) * 0.05,
        "out_w": torch.randn(D, D) * 0.1,
        "out_b": torch.randn(D) * 0.05,
        "proj": torch.randn(D, text) * 0.1,
    }


def test_resampler_parity():
    p = _rand_resampler_params()
    torch.manual_seed(81)
    feats = torch.randn(4, 32)
    ref = _torch_resampler(feats, (2, 2), p).detach().numpy()

    jp = {k: jnp.asarray(v.numpy().T if k in ("kv_w", "out_w") else
                         v.numpy())
          for k, v in p.items()}
    ours = np.asarray(V.minicpmv_resample(jp, NH,
                                          jnp.asarray(feats.numpy()),
                                          (2, 2)))
    assert ours.shape == (QN, 48)
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


def test_llm_surface_minicpmv_checkpoint(tmp_path):
    """Full user path: minicpmv checkpoint on disk (vpm siglip +
    resampler + qwen2 under llm.*), LLM() output equals the HF-composed
    reference (SiglipVisionModel -> torch resampler oracle -> qwen2
    inputs_embeds generate)."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(82)
    vc = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        vision_use_head=False)
    siglip = transformers.SiglipVisionModel(vc).eval()
    tc = transformers.Qwen2Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    tc.architectures = ["Qwen2ForCausalLM"]
    qwen = transformers.Qwen2ForCausalLM(tc).eval()
    rp = _rand_resampler_params()

    d = str(tmp_path / "mcv_ck")
    os.makedirs(d)
    hf_cfg = tc.to_dict()
    hf_cfg["architectures"] = ["MiniCPMV"]
    hf_cfg["model_type"] = "minicpmv"
    hf_cfg["version"] = 2.6
    hf_cfg["vision_config"] = vc.to_dict()
    hf_cfg["image_token_index"] = IMG_TOK
    hf_cfg["resampler_num_heads"] = NH
    hf_cfg["query_num"] = QN
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    # SiglipVisionModel prefixes with vision_model.; vpm.* drops it
    tensors = {"vpm." + k[len("vision_model."):]: v
               for k, v in siglip.state_dict().items()}
    name_map = {"query": "resampler.query",
                "kv_w": "resampler.kv_proj.weight",
                "ln_q": "resampler.ln_q.weight",
                "ln_q_b": "resampler.ln_q.bias",
                "ln_kv": "resampler.ln_kv.weight",
                "ln_kv_b": "resampler.ln_kv.bias",
                "ln_post": "resampler.ln_post.weight",
                "ln_post_b": "resampler.ln_post.bias",
                "in_proj_w": "resampler.attn.in_proj_weight",
                "in_proj_b": "resampler.attn.in_proj_bias",
                "out_w": "resampler.attn.out_proj.weight",
                "out_b": "resampler.attn.out_proj.bias",
                "proj": "resampler.proj"}
    tensors.update({name_map[k]: v for k, v in rp.items()})
    tensors.update({f"llm.{k}": v for k, v in qwen.state_dict().items()})
    save_file({k: v.clone().contiguous() for k, v in tensors.items()},
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

    torch.manual_seed(83)
    px = torch.randn(3, 28, 28)
    with torch.no_grad():
        feats = siglip(px[None]).last_hidden_state[0]
        emb_run = _torch_resampler(feats, (2, 2), rp)
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([IMG_TOK] * QN if tok == IMG_TOK else [tok])
    with torch.no_grad():
        emb = qwen.get_input_embeddings()(torch.tensor([expanded]))
        pos = [i for i, tok in enumerate(expanded) if tok == IMG_TOK]
        emb[0, pos] = emb_run
        hf_out = qwen.generate(inputs_embeds=emb, max_new_tokens=5,
                               do_sample=False, eos_token_id=None)
    ref = hf_out[0].tolist()

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "minicpmv"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy()}])
    assert outs[0].outputs[0].token_ids == ref
