from kvcompress_tpu.prompt_adapter.request import PromptAdapterRequest  # noqa: F401
from kvcompress_tpu.prompt_adapter.models import (  # noqa: F401
    PromptAdapterBank,
    load_peft_prompt_adapter,
)
