"""Host-keyed persistent-compilation-cache directory selection.

XLA:CPU AOT cache entries embed the compile machine's CPU feature set;
loading them on a different host spams cpu_aot_loader errors (and risks
SIGILL). Engine runs may resume on a different machine round to round, so
the default cache directory is keyed by a host fingerprint. Imported by
both engine/llm_engine.py (which applies it at module import) and
__graft_entry__.dryrun_multichip (which must choose a directory BEFORE
importing the engine). Kept dependency-free: importing this module must not
import jax.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform


def host_fingerprint() -> str:
    blob = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    blob += line
                    if line.startswith("flags"):
                        break
    except OSError:
        blob += _platform.processor()
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


def default_cache_dir(tag: str = "") -> str:
    """$KVC_COMPILATION_CACHE, else ~/.cache/kvc_xla[tag]-<host fp>."""
    return os.environ.get(
        "KVC_COMPILATION_CACHE",
        os.path.expanduser(f"~/.cache/kvc_xla{tag}-{host_fingerprint()}"))
