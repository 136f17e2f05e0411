"""Hierarchical latency profiler.

The role of reference vllm/benchmark.py:120-283 (BENCHMARKER): nested named
ranges accumulated into a tree, a @wrap() decorator for hot functions, and
an indented summary. Disabled by default; enable with KVC_PROFILE=1 or
BENCHMARKER.enable().
"""

from __future__ import annotations

import functools
import os
import time
from contextlib import contextmanager
from typing import Dict, List, Optional


class _Node:
    __slots__ = ("name", "total", "count", "children")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: Dict[str, "_Node"] = {}

    def child(self, name: str) -> "_Node":
        node = self.children.get(name)
        if node is None:
            node = self.children[name] = _Node(name)
        return node


class Benchmarker:
    def __init__(self):
        from kvcompress_tpu import envs
        self.enabled = envs.KVC_PROFILE
        self.root = _Node("root")
        self._stack: List[_Node] = [self.root]

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False

    def reset(self) -> None:
        self.root = _Node("root")
        self._stack = [self.root]

    @contextmanager
    def range(self, name: str):
        if not self.enabled:
            yield
            return
        node = self._stack[-1].child(name)
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    def wrap(self, name: Optional[str] = None):
        def deco(fn):
            label = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapped(*a, **kw):
                with self.range(label):
                    return fn(*a, **kw)

            return wrapped

        return deco

    def summarize(self) -> str:
        """Indented tree: name, total seconds, call count, % of parent."""
        lines: List[str] = []

        def walk(node: _Node, depth: int, parent_total: float):
            for child in sorted(node.children.values(),
                                key=lambda n: -n.total):
                pct = (100.0 * child.total / parent_total
                       if parent_total > 0 else 100.0)
                lines.append(
                    f"{'  ' * depth}{child.name}: {child.total:.4f}s "
                    f"(n={child.count}, {pct:.1f}%)")
                walk(child, depth + 1, child.total)

        total = sum(c.total for c in self.root.children.values())
        lines.append(f"profile (total {total:.4f}s):")
        walk(self.root, 1, total)
        return "\n".join(lines)


BENCHMARKER = Benchmarker()
