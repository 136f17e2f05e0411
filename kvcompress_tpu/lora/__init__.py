from kvcompress_tpu.lora.request import LoRARequest  # noqa: F401
from kvcompress_tpu.lora.models import LoRABank, load_peft_adapter  # noqa: F401
