"""Host-side utility services (reference: libs/util/).

Python's standard library replaces most of the reference's 3.5k LoC of
platform code (file_system, string_utils, tokenizer). What remains with
real behavior: the INI reader/writer used by view metadata, leveled
logging, wall/CPU timers, and a declarative CLI argument layer shared by
the apps.
"""

from .ini import parse_ini, save_ini
from .timer import WallTimer, ClockTimer
from .logging import Logger, LogLevel

__all__ = ["parse_ini", "save_ini", "WallTimer", "ClockTimer", "Logger", "LogLevel"]
