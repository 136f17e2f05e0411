"""Opt-out local usage stats (the role of reference vllm/usage/usage_lib.py).

The reference collects platform + engine information at init and POSTs it
to a stats server, with VLLM_NO_USAGE_STATS / VLLM_DO_NOT_TRACK /
~/.config/vllm/do_not_track opt-outs (usage_lib.py:43-54,105-218). This
environment is zero-egress by design, so the TPU port keeps only the LOCAL
side of the contract: the same flat-KV usage record is appended to
~/.config/kvcompress_tpu/usage_stats.json (one JSON object per line), and
the same three opt-outs are honored (KVC_NO_USAGE_STATS=1,
KVC_DO_NOT_TRACK=1, or a `do_not_track` file in the config dir). Nothing
is ever transmitted.
"""

from __future__ import annotations

import json
import os
import platform
import time
import uuid
from threading import Thread
from typing import Any, Dict, Optional

_config_home = os.path.join(
    os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config")),
    "kvcompress_tpu")
_USAGE_STATS_JSON_PATH = os.path.join(_config_home, "usage_stats.json")
_DO_NOT_TRACK_PATH = os.path.join(_config_home, "do_not_track")
_enabled_cache: Optional[bool] = None


def usage_stats_enabled() -> bool:
    global _enabled_cache
    if _enabled_cache is None:
        _enabled_cache = not (
            __import__("kvcompress_tpu.envs", fromlist=["x"]).KVC_DO_NOT_TRACK
            or __import__("kvcompress_tpu.envs",
                          fromlist=["x"]).KVC_NO_USAGE_STATS
            or os.path.exists(_DO_NOT_TRACK_PATH))
    return _enabled_cache


def _collect(model_architecture: str, context: str,
             extra_kvs: Dict[str, Any]) -> Dict[str, Any]:
    import jax
    try:
        devs = jax.devices()
        dev_platform = devs[0].platform
        dev_count = len(devs)
        dev_kind = getattr(devs[0], "device_kind", "")
    except Exception:  # backend not initialisable: still record host info
        dev_platform, dev_count, dev_kind = None, 0, ""
    data: Dict[str, Any] = {
        "uuid": str(uuid.uuid4()),
        "architecture": platform.machine(),
        "platform": platform.platform(),
        "num_cpu": os.cpu_count(),
        "device_platform": dev_platform,
        "device_count": dev_count,
        "device_kind": dev_kind,
        "model_architecture": model_architecture,
        "context": context,
        "log_time": time.time_ns(),
    }
    data.update(extra_kvs)
    return data


def _write(data: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        json.dump(data, f)
        f.write("\n")


def report_usage(model_architecture: str, context: str = "ENGINE_CONTEXT",
                 extra_kvs: Optional[Dict[str, Any]] = None,
                 block: bool = False) -> None:
    """Append one usage record locally (never transmitted). No-op when any
    opt-out is set. Runs on a daemon thread like the reference unless
    `block` (tests)."""
    if not usage_stats_enabled():
        return

    def work():
        try:
            _write(_collect(model_architecture, context, extra_kvs or {}),
                   _USAGE_STATS_JSON_PATH)
        except OSError:
            pass

    if block:
        work()
    else:
        Thread(target=work, daemon=True).start()
