from kvcompress_tpu.guided.processor import (  # noqa: F401
    GuidedDecodingState,
    TokenDFA,
    json_schema_to_regex,
)
