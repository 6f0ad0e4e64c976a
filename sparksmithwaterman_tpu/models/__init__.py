from sparksmithwaterman_tpu.models.aligner import SerialBackend, get_backend
from sparksmithwaterman_tpu.models.pipeline import run_pipeline

__all__ = ["run_pipeline", "SerialBackend", "get_backend"]
