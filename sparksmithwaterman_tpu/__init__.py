"""TPU-native Smith-Waterman alignment framework.

A from-scratch re-design of the capabilities of the reference
SparkSmithWaterman project (Java 8 + Spark 1.5.2) for TPU hardware:

- the serial Smith-Waterman engine (reference ``src/sw/SmithWaterman.java``)
  becomes a NumPy parity oracle (:mod:`sparksmithwaterman_tpu.core.oracle`)
  plus a batched, vectorized JAX/Pallas DP fill
  (:mod:`sparksmithwaterman_tpu.ops`);
- the Spark distribution strategies (reference ``src/sw/Distribution.java``)
  become shardings of the reference-set / read-batch over a
  ``jax.sharding.Mesh`` with XLA collectives
  (:mod:`sparksmithwaterman_tpu.parallel`);
- the wavefront "distribute the algorithm" strategy (reference
  ``src/sw/DistributedSW.java``) becomes an on-device anti-diagonal
  recurrence: with the linear gap penalty the within-row dependency is a
  max-plus prefix scan, computed as one cumulative max per row;
- the ``metrics`` package (dataset generator, dataset stats, running median,
  execution-time sweeps) is mirrored in
  :mod:`sparksmithwaterman_tpu.metrics`.
"""

__version__ = "0.1.0"

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme

__all__ = ["AlignConfig", "ScoringScheme", "__version__"]
