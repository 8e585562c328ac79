"""Run directories, TensorBoard scalars, plain-text logs, timers.

TPU-native equivalent of the reference's observability layer (L6 in
SURVEY.md): run dir ``logs/<model>/<dataset>/run_<timestamp>/`` with a
config snapshot (reference trainval.py:149-231), TensorBoard scalars
(trainval.py:158, 392-396), append-only log.txt (trainval.py:598-604),
plus step-time / input-stall timers the reference only had commented out
(trainval.py:254-266).
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Optional

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def make_run_dir(save_log_dir: str, model_name: str, dataset_name: str,
                 config_json: Optional[str] = None) -> str:
    ts = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(save_log_dir, model_name, dataset_name,
                           f"run_{ts}")
    os.makedirs(run_dir, exist_ok=True)
    if config_json is not None:
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            f.write(config_json)
    _write_provenance(run_dir)
    return run_dir


def _write_provenance(run_dir: str) -> None:
    """Record the code revision alongside the config snapshot (the
    reference copied config.py into the run dir, trainval.py:231; we add
    the git state)."""
    import json
    import subprocess

    info = {"timestamp": datetime.now().isoformat()}
    try:
        info["git_rev"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5, cwd=os.path.dirname(os.path.abspath(__file__))
        ).stdout.strip()
        info["git_dirty"] = bool(subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True,
            text=True, timeout=5,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout.strip())
    except Exception:
        pass
    with open(os.path.join(run_dir, "provenance.json"), "w") as f:
        json.dump(info, f, indent=2)


class RunLogger:
    """SummaryWriter + log.txt + console in one."""

    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.writer = SummaryWriter(run_dir) if SummaryWriter else None
        self.log_path = os.path.join(run_dir, "log.txt")

    def scalar(self, tag: str, value: float, step: int):
        if self.writer:
            self.writer.add_scalar(tag, value, global_step=step)

    def text(self, info: str):
        print(info)
        with open(self.log_path, "a") as f:
            f.write(info + "\n")

    def close(self):
        if self.writer:
            self.writer.close()


class NullLogger:
    """RunLogger-shaped no-op for non-lead hosts in multi-host runs (only
    process 0 owns the run directory, TensorBoard, and log.txt)."""

    def scalar(self, tag: str, value: float, step: int):
        pass

    def text(self, info: str):
        pass

    def close(self):
        pass


class Timer:
    """Cumulative timer (reference utils/timer.py:40-68 analogue)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._start
        self.total += dt
        self.calls += 1
        return dt

    @property
    def average(self) -> float:
        return self.total / max(self.calls, 1)


class StepStats:
    """Train-loop health: step time vs input-stall time."""

    def __init__(self):
        self.step = Timer()
        self.input = Timer()

    def summary(self) -> str:
        return (f"step {self.step.average * 1e3:.1f} ms avg, "
                f"input stall {self.input.average * 1e3:.1f} ms avg "
                f"({100 * self.input.total / max(self.step.total + self.input.total, 1e-9):.1f}%)")
