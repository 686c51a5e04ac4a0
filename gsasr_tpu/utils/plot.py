"""Training-curve extraction helpers.

Equivalent of the reference `basicsr/utils/plot_util.py:4-83`: pull scalar
curves out of tensorboard event files or plain-text logs and EMA-smooth
them for plotting.
"""

from __future__ import annotations

import re


def read_data_from_tensorboard(log_path, tag):
    """Tensorboard event file -> (steps, values) for one scalar tag
    (`plot_util.py:4-20`). Gated on the tensorboard package."""
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(str(log_path))
    ea.Reload()
    events = ea.Scalars(tag)
    return [e.step for e in events], [e.value for e in events]


def read_data_from_txt_2v(path, pattern, step_one=False):
    """Text log -> (steps, values) via a 2-group regex
    (`plot_util.py:23-45`). With step_one, every step is shifted by +1."""
    with open(path) as f:
        lines = [line.strip() for line in f]
    steps, values = [], []
    pat = re.compile(pattern)
    for line in lines:
        match = pat.match(line)
        if match:
            steps.append(int(match.group(1)))
            values.append(float(match.group(2)))
    if step_one:
        steps = [v + 1 for v in steps]
    return steps, values


def read_data_from_txt_1v(path, pattern):
    """Text log -> values via a 1-group regex (`plot_util.py:48-65`)."""
    with open(path) as f:
        lines = [line.strip() for line in f]
    values = []
    pat = re.compile(pattern)
    for line in lines:
        match = pat.match(line)
        if match:
            values.append(float(match.group(1)))
    return values


def smooth_data(values, smooth_weight):
    """EMA smoothing, tensorboard-style (`plot_util.py:68-83`)."""
    values_sm = []
    last_sm_value = values[0]
    for value in values:
        value_sm = last_sm_value * smooth_weight + (1 - smooth_weight) * value
        values_sm.append(value_sm)
        last_sm_value = value_sm
    return values_sm
