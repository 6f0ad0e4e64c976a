"""Benchmarking & dataset tooling (mirror of the reference's ``metrics``
package, SURVEY.md §2 #6-11)."""

from sparksmithwaterman_tpu.metrics.running_median import RunningMedian
from sparksmithwaterman_tpu.metrics.refset_info import (
    RefSetInfo,
    format_info,
    get_info,
    print_all_info,
)
from sparksmithwaterman_tpu.metrics.threaded_refset_info import (
    get_info_threaded,
    print_all_info_threaded,
)
from sparksmithwaterman_tpu.metrics import engineer_data
from sparksmithwaterman_tpu.metrics.execution_times import run_sweeps

__all__ = [
    "RunningMedian",
    "RefSetInfo",
    "format_info",
    "get_info",
    "get_info_threaded",
    "print_all_info",
    "print_all_info_threaded",
    "engineer_data",
    "run_sweeps",
]
