"""Host-keyed persistent-compilation-cache directory selection.

XLA:CPU AOT cache entries embed the compile machine's CPU feature set;
loading them on a different host spams cpu_aot_loader errors (and risks
SIGILL). Engine runs may resume on a different machine round to round, so
the default cache directory is keyed by a host fingerprint. Applied via
configure(), which LLMEngine.__init__ calls - code that compiles engine
programs WITHOUT constructing an LLMEngine (AOT experiments, dryruns)
must call configure() itself, as __graft_entry__.dryrun_multichip and
experiments/run_70b_feasibility.py do. Kept dependency-free at import:
importing this module must not import jax.
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


def default_cache_dir(platform: str, tag: str = "") -> str:
    """$KVC_COMPILATION_CACHE, else a backend-appropriate directory.
    KVC_COMPILATION_CACHE=off disables the persistent cache (returns "").

    TPU compilation results are host-independent, so every host shares
    ~/.cache/kvc_xla (cache keys include the platform, so CPU entries in
    the same directory are never loaded by TPU runs). Only the CPU backend
    needs host-keyed isolation for its AOT entries."""
    from kvcompress_tpu import envs
    env = envs.KVC_COMPILATION_CACHE
    if env:
        return "" if env.lower() in ("off", "none", "0") else env
    if platform in ("tpu", "axon"):
        return os.path.expanduser("~/.cache/kvc_xla")
    return os.path.expanduser(
        f"~/.cache/kvc_xla-{platform}{tag}-{host_fingerprint()}")


def configure(platform: str, tag: str = "") -> str:
    """Point jax's persistent compilation cache at default_cache_dir().
    Safe to call more than once; returns the directory chosen."""
    import jax
    d = default_cache_dir(platform, tag)
    if not d:  # KVC_COMPILATION_CACHE=off
        return d
    try:  # pragma: no cover
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return d
