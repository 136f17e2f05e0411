"""Weight loading from disk formats: safetensors (primary) and the
pytorch_model.bin / .pt fallback (the role of reference model_loader
loader.py pt_weights_iterator)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_model():
    cfg = transformers.Qwen2Config(
        architectures=["Qwen2ForCausalLM"], vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    return transformers.Qwen2ForCausalLM(cfg).eval(), cfg


def _save(model, cfg, d, safe):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    if safe:
        from safetensors.torch import save_file
        save_file({k: v.clone().contiguous()
                   for k, v in model.state_dict().items()},
                  os.path.join(d, "model.safetensors"))
    else:
        torch.save(model.state_dict(),
                   os.path.join(d, "pytorch_model.bin"))


def test_bin_load_matches_safetensors(tmp_path):
    from kvcompress_tpu.models.weights import load_model
    model, cfg = _tiny_model()
    _save(model, cfg, str(tmp_path / "st"), safe=True)
    _save(model, cfg, str(tmp_path / "pt"), safe=False)
    cfg_a, params_a = load_model(str(tmp_path / "st"), dtype=jnp.float32)
    cfg_b, params_b = load_model(str(tmp_path / "pt"), dtype=jnp.float32)
    assert cfg_a.num_layers == cfg_b.num_layers
    for k in params_a["layers"]:
        np.testing.assert_array_equal(np.asarray(params_a["layers"][k]),
                                      np.asarray(params_b["layers"][k]))
    for k in params_a:
        if k == "layers":
            continue
        np.testing.assert_array_equal(np.asarray(params_a[k]),
                                      np.asarray(params_b[k]))


def test_missing_weights_raises(tmp_path):
    from kvcompress_tpu.models.weights import _read_all_tensors
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="safetensors or"):
        _read_all_tensors(str(d))
