"""Weight-only int4 group quantization (AWQ/GPTQ-class, W4A16).

The TPU-native counterpart of the reference's 4-bit quant stack
(vllm/model_executor/layers/quantization/awq.py, gptq.py + the CUDA
dequant kernels csrc/quantization/awq/dequantize.cuh,
csrc/quantization/gptq/qdq_4.cuh). Two halves:

1. RUNTIME wire format: a quantized weight `name` ([.., in, out]) becomes
     name_q4      uint4, same shape   (XLA packs 2/byte on TPU)
     name_scale4  f32 [.., in/g, out] per-(group, out-channel)
     name_zero4   f32 [.., in/g, out] asymmetric zero point
   dequant = (q - z) * s, grouped along the INPUT axis (group_size g,
   default 128, the AWQ/GPTQ convention). The dequant is elementwise on
   the weight operand, so XLA fuses it into the MXU operand stream -
   weight HBM traffic is ~4x smaller than bf16, the binding resource of
   small-batch decode. quantization/int8.py `mm` dispatches here.

2. CHECKPOINT unpacking: AWQ stores qweight int32 [K, N/8] with nibble
   order [0,4,1,5,2,6,3,7] (awq_triton.py:47-58), qzeros int32 [K/g, N/8]
   same packing, scales [K/g, N]; GPTQ stores qweight int32 [K/8, N]
   packed sequentially along K, qzeros int32 [K/g, N/8] along N with the
   historical +1 zero offset (q_gemm.cu:259-264). `dequantize_hf_tensors`
   turns either layout into plain float weights at load time so every
   architecture mapping in models/registry.py works unchanged; pass
   quantization="int4" (the LLM default for such checkpoints) to
   re-quantize into the runtime wire format above.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

# experts excluded: dense-einsum MoE reads [E, d, i] tensors whose dequant
# broadcast differs; int8/fp8 cover those
_INT4_TARGETS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "w_fc1", "w_fc2",
    "shared_gate", "shared_up", "shared_down",
)
DEFAULT_GROUP = 128


# --------------------------------------------------------------------- ours
def _quantize_group(w, g: int) -> Tuple:
    """[.., K, N] float -> (uint4 [.., K, N], scale [.., K/g, N],
    zero [.., K/g, N]) asymmetric per-(group, out-channel)."""
    wf = jnp.asarray(w, jnp.float32)
    *lead, K, N = wf.shape
    assert K % g == 0, f"in-dim {K} not divisible by group {g}"
    grp = wf.reshape(*lead, K // g, g, N)
    # widen the range to include 0 so the zero-point always lands in
    # [0, 15]: clamping z for an all-positive (lo > 0) or all-negative
    # (hi < 0) group would saturate one end of the int4 range and add
    # avoidable error (GPTQ/AWQ packers quantize with 0 representable)
    lo = jnp.minimum(jnp.min(grp, axis=-2), 0.0)
    hi = jnp.maximum(jnp.max(grp, axis=-2), 0.0)
    scale = jnp.maximum(hi - lo, 1e-8) / 15.0
    zero = jnp.clip(jnp.round(-lo / scale), 0, 15)
    q = jnp.clip(jnp.round(grp / scale[..., None, :]) + zero[..., None, :],
                 0, 15).astype(jnp.uint4)
    return (q.reshape(*lead, K, N), scale.astype(jnp.float32),
            zero.astype(jnp.float32))


def quantize_params(params: Dict[str, Any],
                    targets: Optional[Iterable[str]] = None,
                    group_size: int = DEFAULT_GROUP) -> Dict[str, Any]:
    """New param pytree with target weights int4-group-quantized. Weights
    whose input dim is not group-divisible stay unquantized, with a
    warning naming them (a silent skip would leave the user believing
    those layers run W4A16)."""
    import logging
    targets = set(targets or _INT4_TARGETS)
    out = dict(params)
    layers = dict(params["layers"])
    for name in list(layers):
        if name not in targets:
            continue
        w = layers[name]
        if w.shape[-2] % group_size:
            logging.getLogger(__name__).warning(
                "int4: %s input dim %d not divisible by group_size %d; "
                "serving it in full precision", name, w.shape[-2],
                group_size)
            continue
        q, s, z = _quantize_group(w, group_size)
        del layers[name]
        layers[f"{name}_q4"] = q
        layers[f"{name}_scale4"] = s
        layers[f"{name}_zero4"] = z
    out["layers"] = layers
    return out


def dequant(d: Dict[str, Any], name: str, dtype):
    """Dequantized weight for `name` from the q4 triplet ([.., K, N])."""
    q = d[f"{name}_q4"]
    s = d[f"{name}_scale4"]
    z = d[f"{name}_zero4"]
    *lead, K, N = q.shape
    G = s.shape[-2]
    grp = q.reshape(*lead, G, K // G, N).astype(jnp.float32)
    w = (grp - z[..., None, :]) * s[..., None, :]
    return w.reshape(*lead, K, N).astype(dtype)


def mm(x, d: Dict[str, Any], name: str):
    """x @ dequant(name): the group dequant is an elementwise producer of
    the dot operand; XLA fuses it into the matmul read."""
    return x @ dequant(d, name, x.dtype)


# ------------------------------------------------------------- HF unpacking
_AWQ_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def _unpack_cols(packed: np.ndarray) -> np.ndarray:
    """int32 [..., N/8] -> uint [..., N] in AWQ nibble order."""
    shifts = (_AWQ_ORDER * 4)[None, :]
    out = (packed[..., None].view(np.uint32) >> shifts) & 0xF
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


def _unpack_rows(packed: np.ndarray) -> np.ndarray:
    """int32 [K/8, N] -> uint [K, N], sequential nibble order (GPTQ)."""
    shifts = (np.arange(8) * 4)[:, None]
    out = (packed.view(np.uint32)[:, None, :] >> shifts) & 0xF
    return out.reshape(packed.shape[0] * 8, packed.shape[1])


def _unpack_cols_seq(packed: np.ndarray) -> np.ndarray:
    """int32 [..., N/8] -> uint [..., N], sequential order (GPTQ zeros)."""
    shifts = (np.arange(8) * 4)[None, :]
    out = (packed[..., None].view(np.uint32) >> shifts) & 0xF
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


def dequantize_hf_tensors(tensors: Dict[str, np.ndarray],
                          quant_cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Replace every {p}.qweight/.qzeros/.scales triple with a plain
    {p}.weight float tensor in the HF [out, in] orientation the registry
    mappings expect. Supports quant_method awq and gptq at 4 bits."""
    method = quant_cfg.get("quant_method")
    bits = int(quant_cfg.get("bits", quant_cfg.get("w_bit", 4)))
    if method not in ("awq", "gptq") or bits != 4:
        raise ValueError(
            f"unsupported quantization_config: method={method} bits={bits} "
            "(awq/gptq 4-bit supported)")
    if method == "gptq" and quant_cfg.get("desc_act"):
        raise ValueError("gptq desc_act (activation reordering) checkpoints "
                         "are not supported")
    out = dict(tensors)
    prefixes = [k[:-len(".qweight")] for k in tensors if
                k.endswith(".qweight")]
    for p in prefixes:
        qw = tensors[p + ".qweight"]
        qz = tensors[p + ".qzeros"]
        sc = tensors[p + ".scales"].astype(np.float32)
        if method == "awq":
            w_int = _unpack_cols(qw)               # [K, N]
            zeros = _unpack_cols(qz)               # [K/g, N]
        else:
            w_int = _unpack_rows(qw)               # [K, N]
            zeros = _unpack_cols_seq(qz) + 1       # [K/g, N] (+1 offset)
        K, N = w_int.shape
        g = K // sc.shape[0]
        wf = ((w_int.reshape(sc.shape[0], g, N).astype(np.float32)
               - zeros[:, None, :]) * sc[:, None, :]).reshape(K, N)
        # registry mappings expect the HF torch Linear [out, in] layout
        out[p + ".weight"] = np.ascontiguousarray(wf.T)
        for suffix in (".qweight", ".qzeros", ".scales", ".g_idx"):
            out.pop(p + suffix, None)
    return out
