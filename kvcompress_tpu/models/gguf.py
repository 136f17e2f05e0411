"""GGUF checkpoint loading (dependency-free parser + dequant).

The role of the reference's GGUF path (model_loader/loader.py:1013-1070
GGUFModelLoader + gguf_quant_weights_iterator, backed by the `gguf`
package): parse the GGUF container (spec:
ggml/docs/gguf.md - magic, typed metadata KVs, tensor table, aligned data
section), dequantize the common block formats, rename llama.cpp tensor
names to the HF names the registry mappings expect, and un-permute the
q/k projections (llama.cpp stores them rope-permuted relative to HF,
convert_hf_to_gguf.py permute()).

Supported tensor types: F32, F16, Q8_0, Q4_0, Q4_1, and the K-quant
super-block formats Q4_K / Q5_K / Q6_K (what real GGUF checkpoints
actually ship; reference vllm/model_executor/layers/quantization/gguf.py
supports them via the gguf package — here the super-block layouts are
decoded directly). Q2_K/Q3_K and IQ formats are rejected loudly.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# metadata value types (gguf.md)
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, \
    _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = range(13)

_SCALAR = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_BOOL: "<?",
    _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d",
}

# tensor dtypes (ggml_type)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 12, 13, 14
_TYPE_NAMES = {0: "F32", 1: "F16", 2: "Q4_0", 3: "Q4_1", 8: "Q8_0",
               12: "Q4_K", 13: "Q5_K", 14: "Q6_K"}
QK_K = 256  # K-quant super-block size (ggml-quants.h)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0

    def read(self, fmt: str):
        v = struct.unpack_from(fmt, self.d, self.o)[0]
        self.o += struct.calcsize(fmt)
        return v

    def string(self) -> str:
        n = self.read("<Q")
        s = self.d[self.o:self.o + n].decode("utf-8")
        self.o += n
        return s

    def value(self, t: int):
        if t in _SCALAR:
            return self.read(_SCALAR[t])
        if t == _T_STR:
            return self.string()
        if t == _T_ARR:
            et = self.read("<I")
            n = self.read("<Q")
            return [self.value(et) for _ in range(n)]
        raise ValueError(f"unknown gguf metadata type {t}")


def _dequant(raw: bytes, ggml_type: int, n: int,
             offset: int = 0) -> np.ndarray:
    """Flat [n] float32 from the file buffer at `offset` (frombuffer with
    offset reads in place: slicing `raw[offset:]` would COPY the rest of
    the file once per tensor - O(n_tensors x file_size) on real 4 GB
    checkpoints)."""
    if ggml_type == GGML_F32:
        return np.frombuffer(raw, "<f4", count=n,
                             offset=offset).astype(np.float32)
    if ggml_type == GGML_F16:
        return np.frombuffer(raw, "<f2", count=n,
                             offset=offset).astype(np.float32)
    if ggml_type == GGML_Q8_0:
        # blocks of 32: f16 scale + 32 * i8
        b = np.frombuffer(raw, np.uint8, count=(n // 32) * 34,
                          offset=offset).reshape(n // 32, 34)
        d = b[:, :2].copy().view("<f2").astype(np.float32)  # [nb, 1]
        q = b[:, 2:].copy().view(np.int8).astype(np.float32)
        return (q * d).reshape(-1)
    if ggml_type == GGML_Q4_0:
        # blocks of 32: f16 scale + 16 nibble bytes; elem j = byte j low
        # nibble, elem j+16 = byte j high nibble; value = d * (q - 8)
        b = np.frombuffer(raw, np.uint8, count=(n // 32) * 18,
                          offset=offset).reshape(n // 32, 18)
        d = b[:, :2].copy().view("<f2").astype(np.float32)
        lo = (b[:, 2:] & 0xF).astype(np.float32)
        hi = (b[:, 2:] >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)          # [nb, 32]
        return (d * (q - 8.0)).reshape(-1)
    if ggml_type == GGML_Q4_1:
        # f16 d + f16 m + 16 nibble bytes; value = d * q + m
        b = np.frombuffer(raw, np.uint8, count=(n // 32) * 20,
                          offset=offset).reshape(n // 32, 20)
        d = b[:, :2].copy().view("<f2").astype(np.float32)
        m = b[:, 2:4].copy().view("<f2").astype(np.float32)
        lo = (b[:, 4:] & 0xF).astype(np.float32)
        hi = (b[:, 4:] >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)
        return (d * q + m).reshape(-1)
    if ggml_type in (GGML_Q4_K, GGML_Q5_K, GGML_Q6_K):
        return _dequant_k(raw, ggml_type, n, offset)
    raise ValueError(
        f"unsupported ggml tensor type {ggml_type} "
        f"({_TYPE_NAMES.get(ggml_type, 'IQ/Q2_K/Q3_K?')}); supported: "
        f"{sorted(_TYPE_NAMES.values())}")


def _scale_min_k4(sc_b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min table of Q4_K/Q5_K super-blocks
    (ggml-quants.c get_scale_min_k4): 8 (scale, min) pairs per block."""
    nsb = sc_b.shape[0]
    sc = np.empty((nsb, 8), np.float32)
    mn = np.empty((nsb, 8), np.float32)
    for j in range(4):
        sc[:, j] = sc_b[:, j] & 63
        mn[:, j] = sc_b[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (sc_b[:, j + 4] & 0xF) | ((sc_b[:, j - 4] >> 6) << 4)
        mn[:, j] = (sc_b[:, j + 4] >> 4) | ((sc_b[:, j] >> 6) << 4)
    return sc, mn


def _dequant_k(raw: bytes, ggml_type: int, n: int, offset: int
               ) -> np.ndarray:
    """K-quant super-block dequant (ggml-quants.c dequantize_row_q{4,5,6}_K)
    — the formats real GGUF checkpoints actually ship. Layouts:
      Q4_K: f16 d | f16 dmin | 12B 6-bit (scale, min) x8 | 128B nibbles;
            y = d*sc*q - dmin*m over 8 sub-blocks of 32.
      Q5_K: Q4_K + 32B of per-element 5th bits (bit pair 2j/2j+1 selects
            the sub-block pair sharing nibble byte rows).
      Q6_K: 128B low nibbles | 64B high bit-pairs | 16 int8 sub-scales |
            f16 d; y = d*sc*(q - 32) over 16 sub-blocks of 16."""
    nsb = n // QK_K
    if ggml_type == GGML_Q4_K:
        b = np.frombuffer(raw, np.uint8, count=nsb * 144,
                          offset=offset).reshape(nsb, 144)
        d = b[:, 0:2].copy().view("<f2").astype(np.float32)[:, 0]
        dmin = b[:, 2:4].copy().view("<f2").astype(np.float32)[:, 0]
        sc, mn = _scale_min_k4(b[:, 4:16])
        qs = b[:, 16:144]
        q = np.empty((nsb, 8, 32), np.float32)
        for p in range(4):  # nibble byte row p feeds sub-blocks 2p, 2p+1
            row = qs[:, 32 * p:32 * p + 32]
            q[:, 2 * p] = row & 0xF
            q[:, 2 * p + 1] = row >> 4
        y = (d[:, None, None] * sc[:, :, None] * q
             - dmin[:, None, None] * mn[:, :, None])
        return y.reshape(-1)
    if ggml_type == GGML_Q5_K:
        b = np.frombuffer(raw, np.uint8, count=nsb * 176,
                          offset=offset).reshape(nsb, 176)
        d = b[:, 0:2].copy().view("<f2").astype(np.float32)[:, 0]
        dmin = b[:, 2:4].copy().view("<f2").astype(np.float32)[:, 0]
        sc, mn = _scale_min_k4(b[:, 4:16])
        qh = b[:, 16:48]    # [nsb, 32] one bit per sub-block per element
        qs = b[:, 48:176]
        q = np.empty((nsb, 8, 32), np.float32)
        for p in range(4):
            row = qs[:, 32 * p:32 * p + 32]
            q[:, 2 * p] = (row & 0xF) + (((qh >> (2 * p)) & 1) << 4)
            q[:, 2 * p + 1] = (row >> 4) + (((qh >> (2 * p + 1)) & 1) << 4)
        y = (d[:, None, None] * sc[:, :, None] * q
             - dmin[:, None, None] * mn[:, :, None])
        return y.reshape(-1)
    # Q6_K
    b = np.frombuffer(raw, np.uint8, count=nsb * 210,
                      offset=offset).reshape(nsb, 210)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = b[:, 208:210].copy().view("<f2").astype(np.float32)[:, 0]
    y = np.empty((nsb, 256), np.float32)
    li = np.arange(32)
    for h in range(2):  # two independent 128-element halves
        qlh = ql[:, 64 * h:64 * h + 64]
        qhh = qh[:, 32 * h:32 * h + 32]
        is_ = li // 16  # [32] sub-block selector within the half
        for k, (qv, shift) in enumerate((
                ((qlh[:, :32] & 0xF), 0), ((qlh[:, 32:] & 0xF), 2),
                ((qlh[:, :32] >> 4), 4), ((qlh[:, 32:] >> 4), 6))):
            q = (qv | (((qhh >> shift) & 3) << 4)).astype(np.int32) - 32
            sc = scales[:, 8 * h + 2 * k + is_]        # [nsb, 32]
            y[:, 128 * h + 32 * k:128 * h + 32 * k + 32] = (
                d[:, None] * sc * q)
    return y.reshape(-1)


def read_gguf(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """-> (metadata KVs, tensors as float32 numpy in ggml [out, in]
    row-major orientation)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read("<I") != GGUF_MAGIC:
        raise ValueError(f"{path} is not a GGUF file")
    version = r.read("<I")
    if version < 2:
        raise ValueError(f"gguf version {version} too old")
    n_tensors = r.read("<Q")
    n_kv = r.read("<Q")
    meta = {}
    for _ in range(n_kv):
        k = r.string()
        t = r.read("<I")
        meta[k] = r.value(t)
    infos = []
    for _ in range(n_tensors):
        name = r.string()
        nd = r.read("<I")
        dims = [r.read("<Q") for _ in range(nd)]
        ttype = r.read("<I")
        off = r.read("<Q")
        infos.append((name, dims, ttype, off))
    align = int(meta.get("general.alignment", 32))
    base = (r.o + align - 1) // align * align
    tensors = {}
    for name, dims, ttype, off in infos:
        n = int(np.prod(dims))
        flat = _dequant(data, ttype, n, offset=base + off)
        # ggml ne[0] is contiguous: numpy shape is reversed(dims)
        tensors[name] = flat.reshape(tuple(reversed(dims)))
    return meta, tensors


def _unpermute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Inverse of convert_hf_to_gguf.py permute(): llama.cpp stores q/k
    rows reordered for its rope layout; HF order = reshape
    (head, d/2, 2, in) -> swap the (d/2, 2) axes."""
    out, inn = w.shape
    return (w.reshape(n_head, out // n_head // 2, 2, inn)
            .swapaxes(1, 2).reshape(out, inn))


# llama.cpp -> HF names (reference loader.py:1038-1052 name-map role)
_TOP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK = {
    "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj", "attn_output": "self_attn.o_proj",
    "ffn_gate": "mlp.gate_proj", "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    "attn_norm": "input_layernorm", "ffn_norm": "post_attention_layernorm",
}


def load_gguf_model(path: str):
    """-> (hf_config_dict, hf-named float tensors) for a llama-family
    GGUF. The caller feeds these through the normal registry mappings."""
    meta, t = read_gguf(path)
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "mistral"):
        raise ValueError(f"gguf architecture {arch!r} not supported "
                         "(llama/mistral)")
    p = f"{arch}."
    n_head = int(meta[p + "attention.head_count"])
    n_kv = int(meta.get(p + "attention.head_count_kv", n_head))
    n_layers = int(meta[p + "block_count"])
    hidden = int(meta[p + "embedding_length"])
    vocab = (len(meta["tokenizer.ggml.tokens"])
             if "tokenizer.ggml.tokens" in meta
             else int(meta.get(p + "vocab_size", 32000)))
    hf_cfg = {
        "architectures": ["LlamaForCausalLM" if arch == "llama"
                          else "MistralForCausalLM"],
        "hidden_size": hidden,
        "intermediate_size": int(meta[p + "feed_forward_length"]),
        "num_hidden_layers": n_layers,
        "num_attention_heads": n_head,
        "num_key_value_heads": n_kv,
        "max_position_embeddings": int(meta[p + "context_length"]),
        "rms_norm_eps": float(meta.get(
            p + "attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(meta.get(p + "rope.freq_base", 10000.0)),
        "vocab_size": vocab,
        "tie_word_embeddings": "output.weight" not in t,
    }
    out: Dict[str, np.ndarray] = {}
    for k, v in t.items():
        if k in _TOP:
            out[_TOP[k]] = v
        elif k.startswith("blk."):
            _, i, rest = k.split(".", 2)
            rest = rest.removesuffix(".weight")
            if rest not in _BLK:
                raise ValueError(f"unrecognised gguf tensor {k}")
            name = f"model.layers.{i}.{_BLK[rest]}.weight"
            if rest == "attn_q":
                v = _unpermute(v, n_head)
            elif rest == "attn_k":
                v = _unpermute(v, n_kv)
            out[name] = v
        elif k.startswith("rope_freqs"):
            continue
        else:
            raise ValueError(f"unrecognised gguf tensor {k}")
    return hf_cfg, out
