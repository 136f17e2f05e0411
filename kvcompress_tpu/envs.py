"""Central environment-variable registry (reference vllm/envs.py:1-425).

Every KVC_* knob lives here with its type, default, and doc - one place to
discover the deployment surface. Access is LAZY: attributes re-read the
process environment on every access (module-level __getattr__, the
reference's mechanism), so tests and long-lived servers can flip a knob
without re-importing. Modules keep working if they read os.environ
directly, but new code should go through `from kvcompress_tpu import envs`.

    from kvcompress_tpu import envs
    if envs.KVC_PROFILE: ...
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

# name -> (parser of the raw string, default, doc)
_SPECS: Dict[str, tuple] = {
    # -------------------------------------------------- compilation cache
    "KVC_COMPILATION_CACHE": (
        str, "",
        "Persistent XLA compilation-cache directory override; 'off' "
        "disables the cache entirely (utils/hostcache.py)."),
    # ------------------------------------------------------------ sizing
    "KVC_HBM_BYTES": (
        int, 16 << 30,
        "Device HBM budget the AOT memory profiler sizes the KV cache "
        "against when the backend does not report memory_stats "
        "(engine/llm_engine.py _profile_num_blocks)."),
    # ----------------------------------------------------- observability
    "KVC_PROFILE": (
        lambda s: s == "1", False,
        "Enable the hierarchical latency profiler (utils/profiler.py); "
        "summaries via BENCHMARKER.summarize()."),
    "KVC_TRACE_FILE": (
        str, "",
        "JSON-lines file for OTLP-style request spans "
        "(utils/tracing.py); empty disables export."),
    # --------------------------------------------------------- telemetry
    "KVC_NO_USAGE_STATS": (
        lambda s: s == "1", False,
        "Opt out of LOCAL usage records (utils/usage.py; nothing is "
        "ever transmitted - zero-egress build)."),
    "KVC_DO_NOT_TRACK": (
        lambda s: s == "1", False,
        "Same opt-out as KVC_NO_USAGE_STATS (do-not-track convention)."),
    # ----------------------------------------------------- debug/replay
    "KVC_SAVE_CHECKPOINT": (
        str, "",
        "Directory to record engine-step inputs for replay debugging "
        "(utils/debug.py, reference worker debug checkpointer)."),
    "KVC_LOAD_CHECKPOINT": (
        str, "",
        "Directory to replay previously recorded engine steps from."),
    # ---------------------------------------------------- native runtime
    "KVC_DISABLE_NATIVE": (
        lambda s: s == "1", False,
        "Force the pure-python fallbacks for the C host ops "
        "(utils/host_ops.py; csrc/)."),
    # ----------------------------------------------------------- sanitizer
    "KVC_CHECK_INVARIANTS": (
        lambda s: s == "1", False,
        "Verify block-accounting invariants (aliasing, use-after-free, "
        "shard-locality, conservation - utils/invariants.py) after every "
        "engine step; debug/soak mode, costs a device fetch per step."),
    # ---------------------------------------------------- fault injection
    "KVC_TEST_ENABLE_ARTIFICIAL_PREEMPT": (
        lambda s: s == "1", False,
        "Randomly preempt a running sequence each step (reference "
        "VLLM_TEST_ENABLE_ARTIFICIAL_PREEMPT) - recompute-path fault "
        "injection for tests."),
    "KVC_TEST_ARTIFICIAL_PREEMPT_RATE": (
        float, 0.1,
        "Per-step probability for the artificial preemption above."),
    # -------------------------------------------------------- tokenizer
    "KVC_TOKENIZER_POOL_SIZE": (
        int, 0,
        "Worker threads for server-side detokenization off the event "
        "loop (entrypoints tokenizer pool; 0 = inline, reference "
        "VLLM_TOKENIZER_POOL_SIZE analog)."),
}


def __getattr__(name: str) -> Any:
    try:
        parse, default, _doc = _SPECS[name]
    except KeyError:
        raise AttributeError(
            f"module 'kvcompress_tpu.envs' has no attribute {name!r}")
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    try:
        return parse(raw)
    except (TypeError, ValueError):
        return default


def __dir__():
    return sorted(_SPECS)


def document() -> str:
    """Human-readable table of every knob (kvc env-help surface)."""
    lines = []
    for name, (_p, default, doc) in sorted(_SPECS.items()):
        lines.append(f"{name} (default {default!r})\n    {doc}")
    return "\n".join(lines)
