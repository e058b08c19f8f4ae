"""Metrics logging + profiling helpers.

Replaces the reference's TensorBoard summaries + stdout prints
(summary_utils.py, trainer.py:218, evaluator_utils.
print_inference_time_statistics:787) with a JSONL metrics log, latency
statistics, and jax.profiler hooks.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics file + in-memory history."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history: List[Dict] = []
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)

    def log(self, step: int, **values):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) if isinstance(v, (int, float, np.floating))
                    else v for k, v in values.items()})
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec


def device_sync(tree) -> None:
    """Force completion of every computation the tree depends on.

    `jax.block_until_ready` can return before execution finishes on
    remote/tunneled platforms; fetching one element to the host cannot,
    so this is the reliable fence for latency measurement (reference
    counterpart: the implicit sync of sess.run fetches,
    dt_evaluator.py:344-358).
    """
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "ravel")]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def latency_stats(times_s) -> Dict[str, float]:
    """Mean/median/min/max/std over per-sample latencies (reference
    print_inference_time_statistics semantics)."""
    t = np.asarray(times_s, np.float64)
    return {
        "mean_s": float(t.mean()), "median_s": float(np.median(t)),
        "min_s": float(t.min()), "max_s": float(t.max()),
        "std_s": float(t.std()), "fps": float(1.0 / t.mean()),
        "n": int(len(t)),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates host/device split timings for the train loop."""

    def __init__(self):
        self.host_times: List[float] = []
        self.device_times: List[float] = []
        self._t0 = None

    def host_start(self):
        self._t0 = time.perf_counter()

    def host_stop(self):
        self.host_times.append(time.perf_counter() - self._t0)

    def device_start(self):
        self._t0 = time.perf_counter()

    def device_stop(self, result=None):
        if result is not None:
            import jax
            jax.block_until_ready(result)
        self.device_times.append(time.perf_counter() - self._t0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        if self.host_times:
            out["host"] = latency_stats(self.host_times)
        if self.device_times:
            out["device"] = latency_stats(self.device_times)
        return out
