"""Terminal colour helpers (colour.h/colour.c): ANSI escapes, 256-colour and
24-bit spectra for text heat-maps, and unicode bar charts."""

from __future__ import annotations

import math

C_NORMAL = "\033[00m"
C_DARK_RED = "\033[00;31m"
C_RED = "\033[01;31m"
C_DARK_GREEN = "\033[00;32m"
C_GREEN = "\033[01;32m"
C_YELLOW = "\033[01;33m"
C_DARK_YELLOW = "\033[00;33m"
C_DARK_BLUE = "\033[00;34m"
C_BLUE = "\033[01;34m"
C_PURPLE = "\033[00;35m"
C_MAGENTA = "\033[01;35m"
C_DARK_CYAN = "\033[00;36m"
C_CYAN = "\033[01;36m"
C_GREY = "\033[00;37m"
C_WHITE = "\033[01;37m"
C_REV_RED = "\033[01;41m"
C_STANDOUT = "\033[01m"
C_ITALIC = "\033[3m"


def spectrum_24(value: float) -> str:
    """0..1 → 24-bit background escape, blue (cold) → red (hot)."""
    v = min(max(value, 0.0), 1.0)
    r = int(255 * v)
    b = int(255 * (1 - v))
    g = int(128 * (1 - abs(v - 0.5) * 2))
    return f"\033[48;2;{r};{g};{b}m"


def spectrum_256(value: float) -> str:
    """0..1 → 256-colour background escape over the 6x6x6 cube."""
    v = min(max(value, 0.0), 1.0)
    r = int(5 * v)
    b = 5 - r
    g = int(2.5 * (1 - abs(v - 0.5) * 2))
    return f"\033[48;5;{16 + 36 * r + 6 * g + b}m"


def colourise_float01(x: float, high_is_good: bool = True) -> str:
    """Pick a colour for a 0-1 metric (classify.py-style dashboards)."""
    good = x if high_is_good else 1.0 - x
    if good > 0.9:
        return C_GREEN
    if good > 0.7:
        return C_YELLOW
    if good > 0.5:
        return C_DARK_YELLOW
    return C_RED


_BARS = " ▁▂▃▄▅▆▇█"


def unicode_bar(value: float) -> str:
    """0..1 → one of the unicode eighth-block bars (the output-distribution
    chart of charmodel-classify.c:198-212)."""
    v = min(max(value, 0.0), 1.0)
    return _BARS[int(v * 8 + 0.5)]


def bar_chart(values, highlight: int = -1) -> str:
    out = []
    for i, v in enumerate(values):
        if i == highlight:
            out.append(C_RED + unicode_bar(v) + C_NORMAL)
        else:
            out.append(unicode_bar(v))
    return "".join(out)
