"""Compile-vs-execute attribution counters.

The remote-TPU backend has no persistent compilation cache, so every
fresh process pays one XLA compile per distinct program shape (tens of
seconds each over the tunnel). These counters let the bench and the apps
report how much wall-clock went to compilation instead of productive
execution (VERDICT r04 item #1: "instrument it, then kill it").
"""

from __future__ import annotations

import collections

_compile_ms: dict = collections.defaultdict(float)
_compile_count: dict = collections.defaultdict(int)


def record(tag: str, ms: float) -> None:
    _compile_ms[tag] += ms
    _compile_count[tag] += 1


def total_ms(tag: str | None = None) -> float:
    if tag is not None:
        return _compile_ms.get(tag, 0.0)
    return sum(_compile_ms.values())


def counts() -> dict:
    return {k: (_compile_count[k], round(v, 1)) for k, v in _compile_ms.items()}


def reset() -> None:
    _compile_ms.clear()
    _compile_count.clear()
