"""GGUF loading: container parsing, block dequant (Q8_0/Q4_0/Q4_1), the
llama.cpp->HF name map and q/k un-permute, end to end against an
independently written GGUF writer (reference model_loader
GGUFModelLoader + gguf_quant_weights_iterator)."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.models import gguf as G


# ------------------------------------------------------ independent writer
def _s(x: str) -> bytes:
    b = x.encode()
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, t: int, packed: bytes) -> bytes:
    return _s(key) + struct.pack("<I", t) + packed


def q8_0(a: np.ndarray) -> bytes:
    flat = a.reshape(-1, 32).astype(np.float32)
    out = b""
    for blk in flat:
        d = np.abs(blk).max() / 127.0 or 1e-8
        q = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


def q4_0(a: np.ndarray) -> bytes:
    flat = a.reshape(-1, 32).astype(np.float32)
    out = b""
    for blk in flat:
        d = np.abs(blk).max() / 7.0 or 1e-8
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += np.float16(d).tobytes() + packed.tobytes()
    return out


def q4_1(a: np.ndarray) -> bytes:
    flat = a.reshape(-1, 32).astype(np.float32)
    out = b""
    for blk in flat:
        lo, hi = blk.min(), blk.max()
        d = (hi - lo) / 15.0 or 1e-8
        q = np.clip(np.round((blk - lo) / d), 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += (np.float16(d).tobytes() + np.float16(lo).tobytes()
                + packed.tobytes())
    return out


def write_gguf(path, meta_kvs, tensors):
    """tensors: list of (name, np_array_in_hf_orientation, ggml_type,
    raw_bytes). dims are written ggml-style (reversed numpy shape)."""
    head = struct.pack("<IIQQ", G.GGUF_MAGIC, 3, len(tensors),
                       len(meta_kvs))
    body = b"".join(meta_kvs)
    infos, data = b"", b""
    for name, arr, ttype, raw in tensors:
        off = len(data)
        dims = list(reversed(arr.shape))
        infos += (_s(name) + struct.pack("<I", len(dims))
                  + b"".join(struct.pack("<Q", d) for d in dims)
                  + struct.pack("<IQ", ttype, off))
        data += raw
        data += b"\x00" * (-len(data) % 32)
    blob = head + body + infos
    blob += b"\x00" * (-len(blob) % 32)
    with open(path, "wb") as f:
        f.write(blob + data)


def test_dequant_roundtrip_exact():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64,)).astype(np.float32)
    # 4-bit max error is step/2: Q4_0 step = max|a|/7 (~0.45 for unit
    # normals), Q4_1 step = range/15 (~0.3)
    for enc, ttype, tol in ((q8_0, G.GGML_Q8_0, 0.02),
                            (q4_0, G.GGML_Q4_0, 0.3),
                            (q4_1, G.GGML_Q4_1, 0.2)):
        got = G._dequant(enc(a), ttype, 64)
        assert np.abs(got - a).max() < tol, ttype


def hf_permute(w, n_head):
    """convert_hf_to_gguf.py permute() (HF -> llama.cpp layout)."""
    out, inn = w.shape
    return (w.reshape(n_head, 2, out // n_head // 2, inn)
            .swapaxes(1, 2).reshape(out, inn))


def test_unpermute_inverts_convert_permute():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    np.testing.assert_array_equal(G._unpermute(hf_permute(w, 4), 4), w)


def test_load_gguf_llama_end_to_end(tmp_path):
    """A tiny llama written in GGUF (mixed F32/Q8_0 tensors, permuted q/k)
    must load through the normal registry path and match the plain
    safetensors load of the same weights within quantization error."""
    from kvcompress_tpu.models.weights import load_model
    from safetensors.numpy import save_file
    import json as js

    rng = np.random.default_rng(2)
    D, I, V, H, KV, L = 32, 48, 96, 4, 2, 2
    hf = {}
    for i in range(L):
        p = f"model.layers.{i}."
        for name, (o, n) in (("self_attn.q_proj", (D, D)),
                             ("self_attn.k_proj", (D // H * KV, D)),
                             ("self_attn.v_proj", (D // H * KV, D)),
                             ("self_attn.o_proj", (D, D)),
                             ("mlp.gate_proj", (I, D)),
                             ("mlp.up_proj", (I, D)),
                             ("mlp.down_proj", (D, I))):
            hf[p + name + ".weight"] = rng.normal(
                size=(o, n)).astype(np.float32)
        hf[p + "input_layernorm.weight"] = np.ones((D,), np.float32)
        hf[p + "post_attention_layernorm.weight"] = np.ones(
            (D,), np.float32)
    hf["model.embed_tokens.weight"] = rng.normal(
        size=(V, D)).astype(np.float32)
    hf["model.norm.weight"] = np.ones((D,), np.float32)
    hf["lm_head.weight"] = rng.normal(size=(V, D)).astype(np.float32)

    # ---- write the GGUF: q/k permuted, projections Q8_0, rest F32 ----
    metas = [
        _kv("general.architecture", G._T_STR, _s("llama")),
        _kv("llama.attention.head_count", G._T_U32,
            struct.pack("<I", H)),
        _kv("llama.attention.head_count_kv", G._T_U32,
            struct.pack("<I", KV)),
        _kv("llama.block_count", G._T_U32, struct.pack("<I", L)),
        _kv("llama.embedding_length", G._T_U32, struct.pack("<I", D)),
        _kv("llama.feed_forward_length", G._T_U32, struct.pack("<I", I)),
        _kv("llama.context_length", G._T_U32, struct.pack("<I", 128)),
        _kv("llama.vocab_size", G._T_U32, struct.pack("<I", V)),
        _kv("llama.rope.freq_base", G._T_F32, struct.pack("<f", 10000.0)),
    ]
    rev_top = {v: k for k, v in G._TOP.items()}
    rev_blk = {v: k for k, v in G._BLK.items()}
    tensors = []
    for name, w in hf.items():
        if name in rev_top:
            gname = rev_top[name]
        else:
            i, rest = name.split(".")[2], ".".join(
                name.split(".")[3:]).removesuffix(".weight")
            gname = f"blk.{i}.{rev_blk[rest]}.weight"
        gw = w
        if "attn_q" in gname:
            gw = hf_permute(w, H)
        elif "attn_k" in gname:
            gw = hf_permute(w, KV)
        if gw.ndim == 2 and "norm" not in gname:
            tensors.append((gname, gw, G.GGML_Q8_0, q8_0(gw)))
        else:
            tensors.append((gname, gw, G.GGML_F32,
                            gw.astype("<f4").tobytes()))
    path = str(tmp_path / "tiny.gguf")
    write_gguf(path, metas, tensors)

    # ---- plain safetensors checkpoint with the same weights ----
    d = str(tmp_path / "st")
    import os
    os.makedirs(d)
    with open(f"{d}/config.json", "w") as f:
        js.dump({"architectures": ["LlamaForCausalLM"], "hidden_size": D,
                 "intermediate_size": I, "num_hidden_layers": L,
                 "num_attention_heads": H, "num_key_value_heads": KV,
                 "vocab_size": V, "max_position_embeddings": 128,
                 "rms_norm_eps": 1e-5, "tie_word_embeddings": False}, f)
    save_file(hf, f"{d}/model.safetensors")

    cfg_g, pg = load_model(path, dtype=jnp.float32)
    cfg_s, ps = load_model(d, dtype=jnp.float32)
    assert cfg_g.num_layers == cfg_s.num_layers
    assert cfg_g.num_kv_heads == KV
    for k in ps["layers"]:
        a, b = np.asarray(ps["layers"][k]), np.asarray(pg["layers"][k])
        assert np.abs(a - b).max() < 0.03, k  # Q8_0 error bound
    for k in ("embed", "lm_head"):  # also Q8_0-encoded in the gguf
        assert np.abs(np.asarray(ps[k]) - np.asarray(pg[k])).max() < 0.03


def test_kquant_rejected(tmp_path):
    path = str(tmp_path / "kq.gguf")
    metas = [_kv("general.architecture", G._T_STR, _s("llama"))]
    arr = np.zeros((256,), np.float32)
    write_gguf(path, metas, [("blk.0.attn_q.weight", arr.reshape(16, 16),
                              12, b"\x00" * 4096)])  # 12 = Q4_K
    with pytest.raises(ValueError, match="unsupported ggml tensor type"):
        G.read_gguf(path)
