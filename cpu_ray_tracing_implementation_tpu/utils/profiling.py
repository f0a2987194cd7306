"""Observability: phase timers, throughput counters, device traces.

The reference's only instrumentation is one chrono print around sphereflake
(src/main.cc:61-66) and mutex-guarded row logs (src/camera.h:160-161).
Here: structured phase timing with rays/s, optional jax.profiler device
traces (view in TensorBoard/XProf), and a render-stats summary the CLI
prints. All zero-cost when unused.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Phase:
    name: str
    seconds: float = 0.0
    rays: int = 0

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds > 0 else 0.0


@dataclass
class RenderStats:
    """Accumulates per-phase wall clock + ray counts for one render."""

    phases: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, rays: int = 0):
        t0 = time.time()
        try:
            yield
        finally:
            p = self.phases.setdefault(name, Phase(name))
            p.seconds += time.time() - t0
            p.rays += rays

    def summary(self) -> str:
        lines = []
        for p in self.phases.values():
            rate = f" ({p.mrays_per_s:.2f}M rays/s)" if p.rays else ""
            lines.append(f"  {p.name:<22} {p.seconds:8.3f}s{rate}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
    print(f"[profile] device trace written to {log_dir}")
