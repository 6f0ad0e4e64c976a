"""Sharded alignment engine: shard_map over the device mesh.

TPU-native re-design of the reference's two distribution strategies:

- **shard_refs** — ``Distribution.DistributeReference``
  (``src/sw/Distribution.java:227-373``): each RDD element was one
  (reference x all-reads) task; here the reference batch is sharded over
  the mesh's ``'refs'`` axis and every device scores its shard against
  the (replicated or reads-sharded) read batch.  The driver-side
  ``first()/lookup()`` reduce becomes an on-device partial-total + the
  host-side max-merge in the pipeline (implementing the *intent* — true
  max — not the reference's unsorted-``first()`` defect, SURVEY.md §3.2).
- **shard_reads** — the reference's declared-but-unimplemented
  DistributeReads (``src/sw/Distribution.java:440-468``): reads are
  sharded over the ``'reads'`` axis; per-reference totals are summed with
  a ``psum`` over that axis (the collective the reference's design note
  anticipated: "need to remember all matching sites and scores for all
  sequences, before finding max").

Both map onto ONE mesh built once per process (vs. one SparkContext per
job in the reference, ``src/sw/DistributedSW.java:186``).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exports shard_map at top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend
from sparksmithwaterman_tpu.ops.recurrence import score_grid


def _pad_axis0(arr: np.ndarray, multiple: int, fill: int) -> np.ndarray:
    n = arr.shape[0]
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return arr
    pad = np.full((n_pad - n,) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


@functools.partial(
    jax.jit, static_argnames=("mesh", "reads_axis", "refs_axis")
)
def sharded_score_grid(
    reads, refs, match, mismatch, gap, *, mesh: Mesh, reads_axis="reads", refs_axis="refs"
):
    """(R, C) score grid computed with reads and refs sharded on the mesh.

    R must divide by the reads-axis size, C by the refs-axis size (pad
    with READ_PAD/REF_PAD rows; padded scores are exactly 0).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(reads_axis, None), P(refs_axis, None), P(), P(), P()),
        out_specs=P(reads_axis, refs_axis),
        # score_grid's scan carry is initialized shard-locally; skip the
        # varying-manual-axes check rather than pcast inside a function
        # that is also used outside shard_map.
        check_vma=False,
    )
    def block(reads_blk, refs_blk, m, mm, g):
        return score_grid(reads_blk, refs_blk, m, mm, g)

    return block(
        reads,
        refs,
        jnp.asarray(match, jnp.int32),
        jnp.asarray(mismatch, jnp.int32),
        jnp.asarray(gap, jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "reads_axis", "refs_axis")
)
def sharded_totals(
    reads, refs, match, mismatch, gap, *, mesh: Mesh, reads_axis="reads", refs_axis="refs"
):
    """(C,) per-reference totals; the reads-axis partial sums meet in a psum.

    This is the whole-device-resident hot path: the (R, C) grid is never
    materialized on the host (vs. the reference collecting every
    (score, ref, sites) tuple to the driver,
    ``src/sw/Distribution.java:341-353``).  int32: callers chunk R so a
    chunk's total fits (pipeline accumulates across chunks in int64).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(reads_axis, None), P(refs_axis, None), P(), P(), P()),
        out_specs=P(refs_axis),
        check_vma=False,
    )
    def block(reads_blk, refs_blk, m, mm, g):
        scores = score_grid(reads_blk, refs_blk, m, mm, g)  # (R/dr, C/dc)
        local = jnp.sum(scores, axis=0, dtype=jnp.int32)  # (C/dc,)
        return jax.lax.psum(local, reads_axis)

    return block(
        reads,
        refs,
        jnp.asarray(match, jnp.int32),
        jnp.asarray(mismatch, jnp.int32),
        jnp.asarray(gap, jnp.int32),
    )


class ShardedBackend(BatchBackend):
    """Multi-device backend: BatchBackend's bucketing + mesh-sharded scoring.

    ``strategy='shard_refs'`` puts all devices on the refs axis,
    ``'shard_reads'`` on the reads axis; a rectangular mesh combines both.
    Traceback (only for winning refs) stays on the single-device path —
    it is a cold path by construction.
    """

    def __init__(self, config: AlignConfig, mesh: Optional[Mesh] = None):
        super().__init__(config)
        if mesh is None:
            from sparksmithwaterman_tpu.parallel.mesh import build_mesh

            n = len(jax.devices())
            if config.strategy == "shard_reads":
                mesh = build_mesh((1, n))
            else:
                mesh = build_mesh((n, 1))
        self.mesh = mesh
        self._dr = mesh.shape["reads"]
        self._dc = mesh.shape["refs"]
        # Pallas-in-shard_map needs per-shard block alignment; keep the
        # portable lax path inside shard_map (it is the same XLA program
        # the Pallas kernel hand-schedules).  Revisit when manual-mesh
        # pallas_call is wired up.
        self.use_pallas = False

    def _score_grid(self, reads_enc: np.ndarray, refs_enc: np.ndarray) -> np.ndarray:
        from sparksmithwaterman_tpu.models.batch_backend import _pad_rows, _quantize

        r, c = reads_enc.shape[0], refs_enc.shape[0]
        # Quantize row counts (compile-shape stability), then round up to
        # mesh-axis multiples for even sharding.
        reads_p = _pad_axis0(
            _pad_rows(reads_enc, _quantize(r, 8), READ_PAD), self._dr, READ_PAD
        )
        refs_p = _pad_axis0(
            _pad_rows(refs_enc, _quantize(c, 8), REF_PAD), self._dc, REF_PAD
        )
        scores = np.asarray(
            sharded_score_grid(reads_p, refs_p, *self._params, mesh=self.mesh)
        )
        return scores[:r, :c]

    def totals(self, reads: Sequence[str], ref_seqs: Sequence[str]) -> np.ndarray:
        # Same bucketing as BatchBackend (via _score_grid override); a
        # device-resident psum variant is used by the bench path.
        return super().totals(reads, ref_seqs)
