"""Phi-3-Vision (reference vllm/model_executor/models/phi3v.py): HD
2x2-merge transform parity vs an independent torch oracle, and the full
LLM-surface path on an on-disk checkpoint vs an HF-composed reference
(CLIP features -> torch HD oracle -> phi3 inputs_embeds generate)."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import vision as V

IMG_TOK = 120


def _torch_hd_transform(feats, h_crop, w_crop, sub_gn, glb_gn):
    """Independent torch oracle of the reference's hd_feature_transform
    (phi3v.py:209-298, order 'sub_glb'): feats [1+crops, L, C]."""
    def merge(f, hc, wc):
        N, L, C = f.shape
        H = int(L ** 0.5)
        f = (f.reshape(N, H, H, C)
              .reshape(N, H // 2, 2, H // 2, 2, C)
              .permute(0, 1, 3, 2, 4, 5)
              .reshape(N, -1, 4 * C)
              .reshape(1, hc, wc, H // 2, H // 2, 4 * C)
              .permute(0, 1, 3, 2, 4, 5)
              .reshape(hc * H // 2, wc * H // 2, 4 * C))
        return f

    def newline(g):
        h = g.shape[0]
        nl = sub_gn.expand(h, 1, -1)
        return torch.cat([g, nl], dim=1).reshape(-1, g.shape[-1])

    glb = newline(merge(feats[:1], 1, 1))
    sub = newline(merge(feats[1:1 + h_crop * w_crop], h_crop, w_crop))
    return torch.cat([sub, glb_gn.reshape(1, -1), glb])


def test_hd_transform_parity():
    torch.manual_seed(70)
    C = 32
    feats = torch.randn(3, 4, C)          # 1 global + 2 crops, 2x2 grid
    sub_gn = torch.randn(4 * C)
    glb_gn = torch.randn(4 * C)
    ref = _torch_hd_transform(feats, 2, 1, sub_gn, glb_gn).numpy()

    glb = V._phi3v_newline(
        V._phi3v_hd_2x2(jnp.asarray(feats[:1].numpy()), 1, 1),
        jnp.asarray(sub_gn.numpy()))
    sub = V._phi3v_newline(
        V._phi3v_hd_2x2(jnp.asarray(feats[1:].numpy()), 2, 1),
        jnp.asarray(sub_gn.numpy()))
    ours = np.concatenate([np.asarray(sub),
                           glb_gn.numpy()[None], np.asarray(glb)])
    assert ours.shape == (7, 4 * C)       # 4 sub + 1 sep + 2 glb rows
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_llm_surface_phi3v_checkpoint(tmp_path):
    """Full user path: phi3v checkpoint on disk (CLIP tower + HD GNs +
    projector + phi3 text), LLM() loads it, generate(multi_modal_data=
    {"image": tiles, "image_size": (h, w)}) matches the HF-composed
    reference."""
    import json
    import os
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(71)
    vcfg_hf = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    clip = transformers.CLIPVisionModel(vcfg_hf).eval()
    tc = transformers.Phi3Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    tc.architectures = ["Phi3ForCausalLM"]
    phi3 = transformers.Phi3ForCausalLM(tc).eval()
    C = 32
    sub_gn = torch.randn(4 * C) * 0.1
    glb_gn = torch.randn(4 * C) * 0.1
    w1 = torch.randn(48, 4 * C) * 0.05
    b1 = torch.randn(48) * 0.05
    w2 = torch.randn(48, 48) * 0.05
    b2 = torch.randn(48) * 0.05

    d = str(tmp_path / "p3v_ck")
    os.makedirs(d)
    hf_cfg = tc.to_dict()
    hf_cfg["architectures"] = ["Phi3VForCausalLM"]
    hf_cfg["image_token_index"] = IMG_TOK
    hf_cfg["img_processor"] = {
        "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "image_size": 28, "patch_size": 14, "layer_idx": -2}
    hf_cfg["embd_layer"] = {"use_hd_transform": True,
                            "with_learnable_separator": True,
                            "hd_transform_order": "sub_glb"}
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    ve = "model.vision_embed_tokens."
    tensors = {ve + "img_processor." + k: v
               for k, v in clip.state_dict().items()}
    tensors.update({
        ve + "sub_GN": sub_gn.reshape(1, 1, 1, -1),
        ve + "glb_GN": glb_gn.reshape(1, 1, -1),
        ve + "img_projection.0.weight": w1,
        ve + "img_projection.0.bias": b1,
        ve + "img_projection.2.weight": w2,
        ve + "img_projection.2.bias": b2,
    })
    tensors.update(phi3.state_dict())
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

    torch.manual_seed(72)
    image_size = (672, 336)               # h_crop 2, w_crop 1
    px = torch.randn(3, 3, 28, 28)        # global + 2 crops
    # composed HF reference: CLIP layer -2 (CLS dropped) -> HD oracle ->
    # projector -> splice into phi3 embedding stream -> greedy generate
    with torch.no_grad():
        out = clip(px, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]
        emb_run = _torch_hd_transform(feats, 2, 1, sub_gn, glb_gn)
        emb_run = torch.nn.functional.gelu(emb_run @ w1.T + b1) @ w2.T + b2
    n_tok = emb_run.shape[0]
    assert n_tok == 7
    prompt = "hello <image> what is this"
    ids = fast.encode(prompt)
    expanded = []
    for tok in ids:
        expanded.extend([IMG_TOK] * n_tok if tok == IMG_TOK else [tok])
    with torch.no_grad():
        emb = phi3.get_input_embeddings()(torch.tensor([expanded]))
        pos = [i for i, tok in enumerate(expanded) if tok == IMG_TOK]
        emb[0, pos] = emb_run
        hf_out = phi3.generate(inputs_embeds=emb, max_new_tokens=5,
                               do_sample=False, eos_token_id=None)
    ref = hf_out[0].tolist()

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    assert llm._vision is not None and llm._vision[0] == "phi3v"
    outs = llm.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=5,
                                       ignore_eos=True),
                        multi_modal_data=[{"image": px.numpy(),
                                           "image_size": image_size}])
    assert outs[0].outputs[0].token_ids == ref
