"""Timing-file parsers (classify.py:562-656): map audio files to timed
target events, producing the per-channel target strings the classifier's
event grammar consumes.

Formats:
  * toggle timings — `<name> t1 t2 t3 ...`: the class toggles between
    classes[0] and classes[1] at each time;
  * JSON call timings — `["<name>", [start, end, intensity], ...]`: calls
    above an intensity threshold (and under a max duration) switch the
    class on for [start, end);
  * `group: <classes>` lines switch which class group subsequent lines
    target;
  * multiclass timings — `<name>,c%dt<float>:<targets> ...` with %d standing
    for the channel number.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence


def load_binary_timings(path: str, all_classes: Sequence[str],
                        default_state: int = 0,
                        classes: Optional[str] = None,
                        threshold: float = 0.0,
                        max_duration: float = 0.0) -> dict[str, list]:
    """Returns {filename: [(group, class_char, time, target_template)]},
    where target_template has %d for the channel."""
    timings: dict[str, list] = {}
    group = 0
    if classes is None:
        classes = all_classes[0]
    group_string = "%s" + "=" * (len(all_classes) - 1)

    def add_event(events, state, t):
        c = "-" if state is None else classes[state]
        t = float(t)
        events.append((group, c, t,
                       f"c%dt{t:f}:" + (group_string % c)))

    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line[0] == "[":
                calls = json.loads(line)
                name = calls.pop(0)
                events = timings.setdefault(name, [])
                add_event(events, default_state, 0)
                for s, e, intensity in calls:
                    if s == 0:
                        events.pop()
                    if (intensity > threshold and
                            (max_duration == 0 or e - s < max_duration)):
                        add_event(events, 1 - default_state, s)
                        add_event(events, default_state, e)
                    else:
                        add_event(events, None, s)
                        add_event(events, default_state, e)
            else:
                d = line.split()
                name = d.pop(0)
                if name == "group:":
                    classes = d[0]
                    if classes not in all_classes:
                        raise ValueError(
                            f"{path} refers to unknown class group "
                            f"{classes!r}")
                    group = all_classes.index(classes)
                    group_string = ("=" * group + "%s"
                                    + "=" * (len(all_classes) - group - 1))
                else:
                    events = timings.setdefault(name, [])
                    if d:
                        state = default_state
                        if float(d[0]) > 0:
                            add_event(events, state, 0)
                        for t in d:
                            state = 1 - state
                            add_event(events, state, t)
                    else:
                        add_event(events, default_state, 0)
    return timings


def load_multiclass_timings(path: str) -> dict[str, list]:
    """`<filename>,<target-phrases with c%d...>` lines (classify.py:632-656)."""
    timings: dict[str, list] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            name, targets = line.split(",", 1)
            events = timings.setdefault(name, [])
            for target in targets.split():
                secs, c = target[4:].split(":")
                events.append((0, c, float(secs), target))
    return timings


def target_string_for_channel(events: list, channel: int) -> str:
    """Render a file's events as the classifier's target string for one
    channel."""
    return " ".join(tpl % channel if "%d" in tpl else tpl
                    for _, _, _, tpl in events)
