"""Streaming predictor: one-frame-at-a-time inference with on-device
frame state.

Replaces reference run_inference_by_one.py (loads one sample, runs the
FULL pair graph per step). Here each arriving keyframe is encoded once
(towers + RPN) and its features/proposals stay resident on device; the
pair stage (correlation + second stage) runs when the next keyframe
lands — no host round trip of feature maps, and per-keyframe cost is
1x tower work instead of 2x.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamingPredictor:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._encode = jax.jit(
            lambda v, b: model.apply(v, b, method=model.encode_frame))
        self._pair = jax.jit(
            lambda v, a, b: model.apply(v, a, b,
                                        method=model.pair_stage))
        self._state: Optional[Dict] = None
        self.encode_times: List[float] = []
        self.pair_times: List[float] = []

    def reset(self):
        self._state = None

    def push_keyframe(self, frame_batch: Dict[str, np.ndarray],
                      fetch: bool = True) -> Optional[Dict]:
        """Feed one keyframe (arrays with leading batch axis 1).
        Returns pair detections once two keyframes are buffered (the
        result covers the *previous* keyframe + this one), else None.

        With fetch=False the pair output stays on device (returned as
        jax arrays, no host round trip, no timing sync) — the
        throughput path for benchmarks and downstream device-side
        consumers.
        """
        from dodt_tpu.utils.metrics import device_sync
        batch = {k: jnp.asarray(v) for k, v in frame_batch.items()}
        t0 = time.perf_counter()
        state = self._encode({"params": self.params}, batch)
        if fetch:
            device_sync(state["top_anchors"])
            self.encode_times.append(time.perf_counter() - t0)

        prev, self._state = self._state, state
        if prev is None:
            return None
        t0 = time.perf_counter()
        out = self._pair({"params": self.params}, prev, state)
        if not fetch:
            return out
        device_sync(out["final_boxes_3d"])
        self.pair_times.append(time.perf_counter() - t0)
        return {k: np.array(v) for k, v in out.items()}

    def latency_stats(self) -> Dict:
        from dodt_tpu.utils.metrics import latency_stats
        out = {}
        if len(self.encode_times) > 1:
            out["encode"] = latency_stats(self.encode_times[1:])
        if len(self.pair_times) > 1:
            out["pair"] = latency_stats(self.pair_times[1:])
        return out
