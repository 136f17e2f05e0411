"""BART encoder-decoder parity vs HF (reference vllm/model_executor/
models/bart.py role): encoder states, teacher-forced decoder logits, and
cached greedy generation; plus the serving-surface rejection mirroring
the reference's KVC path (no cross-attention KVC semantics there
either)."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import bart as B


@pytest.fixture(scope="module")
def model():
    cfg_hf = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, bos_token_id=0, pad_token_id=1,
        eos_token_id=2, decoder_start_token_id=2, forced_eos_token_id=None)
    torch.manual_seed(0)
    m = transformers.BartForConditionalGeneration(cfg_hf).eval()
    cfg = B.config_from_hf(cfg_hf.to_dict())
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = B.params_from_hf(state, cfg, dtype=jnp.float32)
    return m, cfg, params


def test_encoder_parity(model):
    m, cfg, params = model
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 128, size=11)
    with torch.no_grad():
        ref = m.model.encoder(
            input_ids=torch.tensor(toks[None])).last_hidden_state[0]
    got = B.encode(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_teacher_forced_decoder_logits(model):
    m, cfg, params = model
    rng = np.random.default_rng(1)
    src = rng.integers(3, 128, size=9)
    dec = np.concatenate([[cfg.decoder_start_token_id],
                          rng.integers(3, 128, size=6)])
    with torch.no_grad():
        ref = m(input_ids=torch.tensor(src[None]),
                decoder_input_ids=torch.tensor(dec[None])).logits[0]
    enc = B.encode(params, cfg, jnp.asarray(src, jnp.int32))
    got, _ = B.decode_step(params, cfg, jnp.asarray(dec, jnp.int32), 0,
                           enc)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_greedy_generate_matches_hf(model):
    m, cfg, params = model
    rng = np.random.default_rng(2)
    src = rng.integers(3, 128, size=10).tolist()
    with torch.no_grad():
        out = m.generate(torch.tensor([src]), max_new_tokens=8,
                         do_sample=False, num_beams=1)
    # HF output row: [decoder_start, tok1, ...]; ours is [tok1, ...]
    ref = out[0, 1:].tolist()
    got = B.generate_greedy(params, cfg, src, 8)
    assert got[:len(ref)] == ref


def test_serving_surface_rejects_bart():
    from kvcompress_tpu.models.registry import config_from_hf
    with pytest.raises(ValueError, match="encoder-decoder"):
        config_from_hf({"architectures": ["BartForConditionalGeneration"]})
