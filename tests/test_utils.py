"""Unit tests for mve_tpu.utils (reference: libs/util/timer.h,
frame_timer.h, logging.h:20-55, and SURVEY §5 tracing hooks)."""

import io
import sys
import time

from mve_tpu.utils.timer import WallTimer, ClockTimer, FrameTimer
from mve_tpu.utils.logging import Logger, LogLevel
from mve_tpu.utils.tracing import trace_stage


def test_wall_timer_monotone():
    t = WallTimer()
    a = t.get_elapsed()
    time.sleep(0.02)
    b = t.get_elapsed()
    assert b >= a and b >= 15  # ms
    t.reset()
    assert t.get_elapsed() < b
    assert abs(t.get_elapsed_sec() - t.get_elapsed() / 1000.0) < 0.01


def test_clock_timer():
    t = ClockTimer()
    x = sum(i * i for i in range(200000))
    assert x > 0
    assert t.get_elapsed() >= 0
    assert t.get_elapsed_sec() >= 0.0


def test_frame_timer_paces():
    ft = FrameTimer(target_fps=200.0)
    t0 = time.perf_counter()
    for _ in range(3):
        ft.next_frame()
    assert time.perf_counter() - t0 >= 0.008  # ≥ ~2 frame intervals


def test_logger_levels_and_streams(capsys):
    lg = Logger(LogLevel.INFO)
    lg.error("boom")
    lg.warning("careful")
    lg.info("hello")
    lg.verbose("hidden")
    lg.debug("hidden too")
    cap = capsys.readouterr()
    assert "boom" in cap.err and "careful" in cap.err
    assert "hello" in cap.out
    assert "hidden" not in cap.out and "hidden" not in cap.err

    lg.level = LogLevel.DEBUG
    lg.debug("now visible")
    assert "now visible" in capsys.readouterr().out


def test_trace_stage_reports():
    seen = {}
    with trace_stage("unit", report=lambda n, s: seen.update({n: s})):
        time.sleep(0.01)
    assert "unit" in seen and seen["unit"] >= 0.008
