"""EAGLE speculative decoding (reference vllm/model_executor/models/
eagle.py + spec_decode): the draft's layer-0 input is
fc([token_embed ; target_hidden]) with the verify program exporting
target hiddens on device. Correctness is guaranteed by verification
(output must equal plain greedy regardless of the fc); the "embed" fc
with the target's own layers reduces eagle to an exact self-draft, so
acceptance must be ~100% and steps must halve."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import SpeculativeConfig
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.eagle import init_eagle_params
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _run(params, draft, spec_tokens, prompt, max_tokens=20):
    cfg = tiny_cfg()
    cfg.speculative = SpeculativeConfig(
        num_speculative_tokens=spec_tokens,
        method="eagle" if draft is not None else "ngram",
        draft_window=64)
    cfg.kvcompress.enabled = False
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla",
                    draft=draft)
    eng.multi_step = 1
    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=max_tokens,
                              ignore_eos=True))
    steps, outs = 0, {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                outs[out.request_id] = out
        steps += 1
        assert steps < 200
    return outs[rid].outputs[0].token_ids, steps, eng


def test_eagle_exact_selfdraft_accepts(params):
    """fc=[I;0] + target layers == the target itself: output identical to
    plain greedy, acceptance ~100%, steps at most half."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=20).tolist()
    dcfg, dparams = init_eagle_params(tiny_cfg().model, params,
                                      fc_mode="embed")
    assert dcfg.eagle

    base, base_steps, _ = _run(params, None, 0, prompt)
    got, spec_steps, eng = _run(params, (dcfg, dparams), 3, prompt)
    assert got == base
    acc = eng.stats.counters.get("spec_accepted_tokens", 0)
    prop = eng.stats.counters.get("spec_proposed_tokens", 1)
    assert acc / prop > 0.9, (acc, prop)
    assert spec_steps <= -(-base_steps // 2), (spec_steps, base_steps)


@pytest.mark.full
def test_eagle_mix_fc_stays_exact(params):
    """A fc that actually mixes in the hidden stream (the real eagle
    regime) may propose badly but can never change the output."""
    rng = np.random.default_rng(1)
    for trial in range(2):
        prompt = rng.integers(0, VOCAB, size=14).tolist()
        dcfg, dparams = init_eagle_params(tiny_cfg().model, params,
                                          fc_mode="mix")
        base, _, _ = _run(params, None, 0, prompt, max_tokens=12)
        got, _, eng = _run(params, (dcfg, dparams), 2, prompt,
                           max_tokens=12)
        assert got == base, trial
        assert eng.scheduler.free_blocks == eng.scheduler.total_blocks


def test_eagle_checkpoint_roundtrip(tmp_path, params):
    """load_eagle reads an EAGLE-layout checkpoint (fc + bare layer names,
    no lm_head/embed) and produces a draft whose engine run is exact."""
    import json
    from safetensors.numpy import save_file
    from kvcompress_tpu.models.eagle import load_eagle

    mc = tiny_cfg().model
    rng = np.random.default_rng(2)
    D = mc.hidden_size
    t = {}
    src = init_llama_params(mc, seed=7, dtype=jnp.float32)
    lw = src["layers"]
    names = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
             "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
             "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
             "w_down": "mlp.down_proj"}
    for i in range(mc.num_layers):
        for ours, theirs in names.items():
            t[f"layers.{i}.{theirs}.weight"] = np.asarray(
                lw[ours][i]).T.copy()
        t[f"layers.{i}.input_layernorm.weight"] = np.asarray(
            lw["input_norm"][i])
        t[f"layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            lw["post_attn_norm"][i])
    t["fc.weight"] = rng.standard_normal((D, 2 * D)).astype(np.float32)
    t["fc.bias"] = np.zeros((D,), np.float32)
    d = str(tmp_path / "eagle")
    import os
    os.makedirs(d)
    with open(f"{d}/config.json", "w") as f:
        json.dump({"model": {
            "vocab_size": mc.vocab_size, "hidden_size": D,
            "intermediate_size": mc.intermediate_size,
            "num_hidden_layers": mc.num_layers,
            "num_attention_heads": mc.num_heads,
            "num_key_value_heads": mc.num_kv_heads,
            "max_position_embeddings": mc.max_model_len,
            "rms_norm_eps": 1e-5,
        }, "model_type": "eagle"}, f)
    save_file(t, f"{d}/model.safetensors")

    dcfg, dparams = load_eagle(d, mc, params, dtype=jnp.float32)
    assert dcfg.eagle and "fc_w" in dparams
    np.testing.assert_array_equal(np.asarray(dparams["embed"]),
                                  np.asarray(params["embed"]))

    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, size=12).tolist()
    base, _, _ = _run(params, None, 0, prompt, max_tokens=8)
    got, _, _ = _run(params, (dcfg, dparams), 2, prompt, max_tokens=8)
    assert got == base


def test_fc_embed_masks_position_zero():
    """Loaded EAGLE checkpoints zero the fc output where position == 0
    (reference eagle.py:91); the synthetic self-draft constructor opts
    out via eagle_mask_pos0=False."""
    from kvcompress_tpu.models.eagle import fc_embed, init_eagle_params
    rng = np.random.default_rng(7)
    D = 8
    dparams = {"fc_w": jnp.asarray(rng.normal(size=(2 * D, D)),
                                   jnp.float32)}
    x = jnp.asarray(rng.normal(size=(3, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(3, D)), jnp.float32)
    pos = jnp.asarray([0, 1, 2], jnp.int32)
    y = np.asarray(fc_embed(dparams, x, h, pos))
    np.testing.assert_array_equal(y[0], np.zeros(D, np.float32))
    y_unmasked = np.asarray(fc_embed(dparams, x, h))
    np.testing.assert_array_equal(y[1:], y_unmasked[1:])
    assert np.abs(y_unmasked[0]).sum() > 0

    mc = tiny_cfg().model
    params = init_llama_params(mc, seed=0, dtype=jnp.float32)
    dcfg, _ = init_eagle_params(mc, params, fc_mode="embed")
    assert not dcfg.eagle_mask_pos0
