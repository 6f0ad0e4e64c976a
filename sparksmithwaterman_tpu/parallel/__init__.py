"""Multi-device parallelism: mesh construction and sharded engines.

TPU-native replacement for the reference's Spark distribution layer
(``src/sw/Distribution.java``, ``pom.xml:27-37``): instead of RDDs over a
Hadoop cluster, a :class:`jax.sharding.Mesh` over ICI/DCN with
``shard_map`` + XLA collectives.
"""

from sparksmithwaterman_tpu.parallel.mesh import build_mesh, mesh_devices
from sparksmithwaterman_tpu.parallel.engine import (
    ShardedBackend,
    sharded_score_grid,
    sharded_totals,
)
from sparksmithwaterman_tpu.parallel.seqparallel import (
    SeqParallelBackend,
    seqparallel_scores,
)

__all__ = [
    "build_mesh",
    "mesh_devices",
    "ShardedBackend",
    "sharded_score_grid",
    "sharded_totals",
    "SeqParallelBackend",
    "seqparallel_scores",
]
