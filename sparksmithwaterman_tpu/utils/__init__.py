"""Cross-cutting utilities (profiling, counters)."""

from sparksmithwaterman_tpu.utils.profiling import GcupsCounter, profiler_trace

__all__ = ["GcupsCounter", "profiler_trace"]
