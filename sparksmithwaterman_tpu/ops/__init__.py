from sparksmithwaterman_tpu.ops.recurrence import (
    fill_pairs,
    score_grid,
    score_pairs,
)
from sparksmithwaterman_tpu.ops.traceback import sites_from_fill

__all__ = ["score_pairs", "score_grid", "fill_pairs", "sites_from_fill"]
