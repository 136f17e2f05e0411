from kvcompress_tpu.quantization.int8 import quantize_params  # noqa: F401
