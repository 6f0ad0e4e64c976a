"""Device-mesh construction.

The reference builds one ``JavaSparkContext`` per job (pathologically, one
per DP matrix under DistributeAlgorithm — ``src/sw/DistributedSW.java:186``,
documented "Not optimal" at ``:31``).  The TPU-native design builds ONE
mesh per process and reuses it for every batch; axis names:

- ``'refs'``  — shards of the reference database (the reference's
  DistributeReference axis, ``src/sw/Distribution.java:227-373``).
- ``'reads'`` — shards of the read batch (the reference's declared-but-
  unimplemented DistributeReads axis, ``src/sw/Distribution.java:440-468``).

On a multi-host slice the 'refs' axis should span DCN (reference shards
are independent files) and 'reads' ICI (read partial sums need a psum).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def mesh_devices(n_devices: Optional[int] = None) -> list:
    """Devices for THIS process's mesh.

    ``local_devices()`` (not ``devices()``): under a multi-process
    runtime (``jax.distributed``) each host drives its own chip mesh
    over ICI while the host axis — the reference-file manifest — rides
    DCN via ``process_allgather`` (``parallel/multihost.py``).  A global
    mesh here would require every process to execute every per-shard
    dispatch in lockstep, which is exactly the Spark-driver bottleneck
    the design avoids.  Single-process, local == global.
    """
    devs = jax.local_devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return devs


def build_mesh(
    axis_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("refs", "reads"),
    n_devices: Optional[int] = None,
) -> Mesh:
    """Build the global mesh.

    Default: all devices on the 'refs' axis, 'reads' axis of size 1 —
    reference-set sharding is the strategy the reference found effective
    (its README recommends DistributeReference for speed,
    ``README.md:145-191``).
    """
    devs = mesh_devices(n_devices)
    if axis_shape is None:
        axis_shape = (len(devs), 1)
    if int(np.prod(axis_shape)) != len(devs):
        raise ValueError(f"axis_shape {axis_shape} != {len(devs)} devices")
    dev_array = np.asarray(devs).reshape(tuple(axis_shape))
    return Mesh(dev_array, tuple(axis_names))
