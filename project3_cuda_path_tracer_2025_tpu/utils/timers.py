"""Performance timing utilities.

TPU analogue of ``StreamCompaction::Common::PerformanceTimer``
(``stream_compaction/common.h:46-130``): wall-clock brackets around
``jax.block_until_ready`` plus simple running statistics, and a frame-average
readout mirroring the ImGui ms/frame counter (``src/main.cpp:288``) that is
the source of all reference benchmark numbers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp


def device_sync(*arrays) -> None:
    """Actually wait for computation of ``arrays`` to finish.

    ``jax.block_until_ready`` does NOT synchronize on the remote-tunnel
    (axon) TPU backend -- it returns in ~0.1 ms even with seconds of compute
    queued.  The only reliable sync is a host fetch; fetching whole arrays
    pays huge tunnel transfer (64 MB ~= 6 s), so reduce to one scalar on
    device and fetch 4 bytes (~22 ms roundtrip).  On CPU this degenerates to
    a cheap local fetch."""
    leaves = [l for a in arrays for l in jax.tree_util.tree_leaves(a)]
    if not leaves:
        return
    s = sum(jnp.sum(l.ravel()[:1].astype(jnp.float32)) for l in leaves)
    float(s)  # host fetch forces completion of everything above


class PerformanceTimer:
    """start/stop CPU+device timer; device timing blocks on computation."""

    def __init__(self) -> None:
        self._t0 = None
        self.elapsed_ms = 0.0

    def start(self) -> None:
        if self._t0 is not None:
            raise RuntimeError("timer already started")
        self._t0 = time.perf_counter()

    def stop(self, *block_on) -> float:
        if self._t0 is None:
            raise RuntimeError("timer not started")
        device_sync(*block_on)
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        self._t0 = None
        return self.elapsed_ms


@dataclass
class FrameStats:
    """Running ms/frame average (the reference's perf oracle)."""

    times_ms: List[float] = field(default_factory=list)

    def add(self, ms: float) -> None:
        self.times_ms.append(ms)

    @property
    def mean_ms(self) -> float:
        return sum(self.times_ms) / max(1, len(self.times_ms))

    @property
    def fps(self) -> float:
        m = self.mean_ms
        return 1000.0 / m if m > 0 else 0.0

    def mrays_per_s(self, rays_per_frame: float) -> float:
        m = self.mean_ms
        return rays_per_frame / (m * 1e3) if m > 0 else 0.0
