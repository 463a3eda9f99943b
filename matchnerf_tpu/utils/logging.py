"""Color console logger + training timer.

Covers the reference's `Log` singleton and EMA iteration timer
(`/root/reference/misc/utils.py:70-127`) with an ANSI-based implementation
(no termcolor dependency).
"""
from __future__ import annotations

import datetime
import sys
import time
from typing import Mapping

_COLORS = {
    "red": "31", "green": "32", "yellow": "33", "blue": "34",
    "magenta": "35", "cyan": "36", "grey": "90",
}


def _c(msg, color, bold=False, underline=False):
    if not sys.stdout.isatty():
        return str(msg)
    attrs = []
    if bold:
        attrs.append("1")
    if underline:
        attrs.append("4")
    attrs.append(_COLORS[color])
    return f"\033[{';'.join(attrs)}m{msg}\033[0m"


def get_time(sec: float):
    d = int(sec // (24 * 60 * 60))
    h = int(sec // (60 * 60) % 24)
    m = int((sec // 60) % 60)
    s = int(sec % 60)
    return d, h, m, s


class Log:
    def title(self, message):
        print(_c(message, "yellow", bold=True, underline=True))

    def info(self, message):
        print(_c(message, "magenta", bold=True))

    def warn(self, message):
        print(_c(message, "yellow"))

    def error(self, message):
        print(_c(message, "red", bold=True))

    def options(self, opt: Mapping, level: int = 0):
        for key, value in sorted(opt.items()):
            if isinstance(value, Mapping):
                print("   " * level + _c("* ", "cyan") + _c(key, "green") + ":")
                self.options(value, level + 1)
            else:
                print("   " * level + _c("* ", "cyan") + _c(key, "green") + ":",
                      _c(value, "yellow"))

    def loss_train(self, max_epoch, ep, lr_dict, loss, timer):
        message = _c("[train] ", "grey", bold=True)
        message += "epoch {}/{}".format(_c(ep, "cyan", bold=True), max_epoch)
        for k, v in lr_dict.items():
            message += ", lr_{}:{}".format(k, _c(f"{v:.2e}", "yellow", bold=True))
        message += ", loss:{}".format(_c(f"{loss:.3e}", "red", bold=True))
        if timer.get("elapsed") is not None:
            message += ", time:{}".format(
                _c("{0}-{1:02d}:{2:02d}:{3:02d}".format(*get_time(timer["elapsed"])), "blue", bold=True))
        if timer.get("arrival") is not None:
            message += " (ETA:{})".format(
                _c("{0}-{1:02d}:{2:02d}:{3:02d}".format(*get_time(timer["arrival"])), "blue"))
        print(message)

    def metric_test(self, metric):
        print(_c("[test] ", "grey", bold=True) + _c(metric, "blue", bold=True))

    def timestamp(self):
        return datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")


log = Log()


def update_timer(timer: dict, max_epoch: int, ep: int, it_per_ep: int, momentum: float = 0.99):
    """EMA per-iteration time + ETA, mirroring `misc/utils.py:119-127`."""
    timer["elapsed"] = time.time() - timer["start"]
    timer["it"] = timer["it_end"] - timer["it_start"]
    prev = timer.get("it_mean")
    timer["it_mean"] = (prev * momentum + timer["it"] * (1 - momentum)) if prev is not None else timer["it"]
    timer["arrival"] = timer["it_mean"] * it_per_ep * (max_epoch - ep)
