"""Profiling helpers: jax traces + per-kernel roofline accounting.

The reference's observability surface is criterion + pprof flamegraphs
(SURVEY.md §5.1); the TPU equivalents are jax profiler traces and a
speed-of-light model for the limb kernels (BASELINE.md's per-kernel
accounting)."""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/halo2_tpu_trace"):
    """Capture a jax profiler trace around a block (view with
    tensorboard or xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def modmul_speed_of_light(clock_hz: float = 0.94e9, lanes: int = 1024,
                          int_ops_per_mul: int = 600) -> float:
    """Upper bound on 255-bit Montgomery multiplies/sec for one chip's
    VPU: lanes × clock / int-ops-per-multiply. With 16×16-bit digits a
    multiply costs ~256 lane-muls + ~150 reduction muls + carry adds
    (~600 lane-ops total)."""
    return clock_hz * lanes / int_ops_per_mul


def kernel_efficiency(measured_per_s: float, **sol_kwargs) -> float:
    """measured / speed-of-light fraction for the modmul kernel."""
    return measured_per_s / modmul_speed_of_light(**sol_kwargs)


class StageTimer:
    """Wall-clock accounting of prover phases (the criterion-bench
    analogue); use `with timer.stage("ntt"):` around device work."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = (self.stages.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.stages.values()) or 1.0
        lines = [f"{name:24s} {dt:8.3f}s {100*dt/total:5.1f}%"
                 for name, dt in sorted(self.stages.items(),
                                        key=lambda kv: -kv[1])]
        return "\n".join(lines)
