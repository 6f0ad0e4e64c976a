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
from typing import Optional

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


def _kernel_plan(rb: int, m: int, n: int):
    """Per-shard diag-kernel plan: whole-table when it fits scoped VMEM
    (``plan_diag``'s calibrated model), else the streamed chunked form.

    Single source of truth shared with the single-device wrappers
    (``ops/pallas_score``) — the sharded path previously hardcoded
    unroll=64, which OOMs on hardware for reads padded past 128bp.
    """
    from sparksmithwaterman_tpu.models.batch_backend import _CHUNKED_REF_N
    from sparksmithwaterman_tpu.ops.pallas_score import _plan_chunk, plan_diag

    diags = m + n - 1
    if n <= _CHUNKED_REF_N:
        p = plan_diag(rb, m, n)
        if p is not None:
            unroll, t_pad = p
            return dict(
                mode="whole", unroll=unroll, t_pad=t_pad, diags=diags
            )
    chunk, unroll = _plan_chunk(rb, m, 2048, 64, extra_regs=4)
    num_chunks = -(-diags // chunk)
    return dict(
        mode="chunked",
        unroll=unroll,
        t_pad=num_chunks * chunk,
        diags=diags,
        chunk=chunk,
        num_chunks=num_chunks,
    )


def _sharded_windows(refs, mesh, refs_axis, m, t_pad):
    """Per-diagonal window tables, built with refs ALREADY sharded over
    ``refs_axis`` (each device builds only its shard's table, in
    parallel) — building them inside the score jit hands the Pallas
    kernel a non-default layout and the window DMA goes strided (136 vs
    228 GCUPS measured on v5e; see ``ops/pallas_score._diag_windows``).
    """
    from jax.sharding import NamedSharding

    from sparksmithwaterman_tpu.ops.pallas_score import _diag_windows

    refs_sharded = jax.device_put(
        np.asarray(refs, np.int32), NamedSharding(mesh, P(refs_axis, None))
    )
    return _diag_windows(refs_sharded, m, t_pad)


def sharded_score_grid(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    mesh: Mesh,
    reads_axis="reads",
    refs_axis="refs",
    kernel_params=None,
    interpret=False,
):
    """(R, C) score grid computed with reads and refs sharded on the mesh.

    R must divide by the reads-axis size, C by the refs-axis size (pad
    with READ_PAD/REF_PAD rows; padded scores are exactly 0).

    ``kernel_params``: None for the portable lax path, or a static
    ``(match, mismatch, gap, read_block)`` tuple to run the Pallas
    wavefront kernel on each shard (per-shard read count must be a
    multiple of read_block; ``interpret=True`` runs the kernel in
    interpret mode for off-TPU CI).  The per-shard unroll/chunking is
    resolved by the calibrated VMEM model (``_kernel_plan``).
    """
    if kernel_params is not None:
        km, kmm, kg, rb = kernel_params
        m, n = reads.shape[1], refs.shape[1]
        plan = _kernel_plan(rb, m, n)
        windows = _sharded_windows(refs, mesh, refs_axis, m, plan["t_pad"])
        return _sharded_kernel_call(
            jnp.asarray(reads).astype(jnp.int32),
            windows,
            mesh=mesh,
            reads_axis=reads_axis,
            refs_axis=refs_axis,
            kernel_params=kernel_params,
            plan=tuple(sorted(plan.items())),
            totals=False,
            interpret=interpret,
        )
    return _sharded_lax_call(
        reads,
        refs,
        jnp.asarray(match, jnp.int32),
        jnp.asarray(mismatch, jnp.int32),
        jnp.asarray(gap, jnp.int32),
        mesh=mesh,
        reads_axis=reads_axis,
        refs_axis=refs_axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "reads_axis", "refs_axis", "kernel_params", "plan",
        "totals", "interpret",
    ),
)
def _sharded_kernel_call(
    reads_i,
    windows,
    *,
    mesh: Mesh,
    reads_axis,
    refs_axis,
    kernel_params,
    plan,
    totals,
    interpret,
):
    """shard_map'd Pallas dispatch: every device runs the wavefront
    kernel on its (read-shard x ref-shard) block; ``totals=True`` sums
    the block's read axis and psums partial totals over ``reads_axis``
    (the collective merge of the reference's DistributeReads design
    note, ``src/sw/Distribution.java:467-468``)."""
    from sparksmithwaterman_tpu.ops.pallas_score import (
        _score_chunked_call,
        _score_diag_call,
    )

    km, kmm, kg, rb = kernel_params
    p = dict(plan)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(reads_axis, None), P(refs_axis, None, None)),
        out_specs=P(refs_axis) if totals else P(reads_axis, refs_axis),
        check_vma=False,
    )
    def block(reads_blk, windows_blk):
        if p["mode"] == "whole":
            scores = _score_diag_call(
                reads_blk,
                windows_blk,
                match=km,
                mismatch=kmm,
                gap=kg,
                read_block=rb,
                diags=p["diags"],
                dtype=jnp.int32,
                unroll=p["unroll"],
                interpret=interpret,
            )
        else:
            scores = _score_chunked_call(
                reads_blk,
                windows_blk,
                match=km,
                mismatch=kmm,
                gap=kg,
                read_block=rb,
                chunk=p["chunk"],
                unroll=p["unroll"],
                num_chunks=p["num_chunks"],
                interpret=interpret,
            )
        if not totals:
            return scores
        local = jnp.sum(scores, axis=0, dtype=jnp.int32)
        return jax.lax.psum(local, reads_axis)

    return block(reads_i, windows)


@functools.partial(
    jax.jit, static_argnames=("mesh", "reads_axis", "refs_axis")
)
def _sharded_lax_call(
    reads, refs, match, mismatch, gap, *, mesh: Mesh, reads_axis, refs_axis
):
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

    return block(reads, refs, match, mismatch, gap)


def sharded_totals(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    mesh: Mesh,
    reads_axis="reads",
    refs_axis="refs",
    kernel_params=None,
    interpret=False,
):
    """(C,) per-reference totals; the reads-axis partial sums meet in a psum.

    This is the whole-device-resident hot path: the (R, C) grid is never
    materialized on the host (vs. the reference collecting every
    (score, ref, sites) tuple to the driver,
    ``src/sw/Distribution.java:341-353``).  int32: callers chunk R so a
    chunk's total fits (pipeline accumulates across chunks in int64).

    ``kernel_params``: as in :func:`sharded_score_grid` — a static
    ``(match, mismatch, gap, read_block)`` tuple selects the Pallas
    wavefront kernel per shard (windows pre-built sharded, see there).
    """
    if kernel_params is not None:
        km, kmm, kg, rb = kernel_params
        m, n = reads.shape[1], refs.shape[1]
        plan = _kernel_plan(rb, m, n)
        windows = _sharded_windows(refs, mesh, refs_axis, m, plan["t_pad"])
        return _sharded_kernel_call(
            jnp.asarray(reads).astype(jnp.int32),
            windows,
            mesh=mesh,
            reads_axis=reads_axis,
            refs_axis=refs_axis,
            kernel_params=kernel_params,
            plan=tuple(sorted(plan.items())),
            totals=True,
            interpret=interpret,
        )
    return _sharded_totals_lax_call(
        reads,
        refs,
        jnp.asarray(match, jnp.int32),
        jnp.asarray(mismatch, jnp.int32),
        jnp.asarray(gap, jnp.int32),
        mesh=mesh,
        reads_axis=reads_axis,
        refs_axis=refs_axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "reads_axis", "refs_axis", "kernel_params", "plan",
        "interpret",
    ),
)
def _sharded_packed_call(
    packed,
    windows,
    start_idx,
    *,
    mesh: Mesh,
    reads_axis,
    refs_axis,
    kernel_params,
    plan,
    interpret,
):
    """shard_map'd PACKED dispatch: packed read rows shard over
    ``reads_axis``, window tables over ``refs_axis``; each device runs
    the packed wavefront kernel on its block, gathers ITS rows' read
    scores from the in-kernel segmented suffix max, sums them, and the
    row-shard partial totals meet in a psum.  Output: (C,) totals
    sharded over ``refs_axis``.
    """
    from sparksmithwaterman_tpu.ops.pallas_score import (
        _lane_best_call,
        _lane_best_chunked_call,
    )

    km, kmm, kg, rb = kernel_params
    p = dict(plan)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(reads_axis, None), P(refs_axis, None, None), P()),
        out_specs=P(refs_axis),
        check_vma=False,
    )
    def block(packed_blk, windows_blk, idx):
        if p["mode"] == "whole":
            lane = _lane_best_call(
                packed_blk, windows_blk,
                match=km, mismatch=kmm, gap=kg, read_block=rb,
                diags=p["diags"], unroll=p["unroll"], interpret=interpret,
            )
        else:
            lane = _lane_best_chunked_call(
                packed_blk, windows_blk,
                match=km, mismatch=kmm, gap=kg, read_block=rb,
                chunk=p["chunk"], unroll=p["unroll"],
                num_chunks=p["num_chunks"], interpret=interpret,
            )
        rows_blk, m = packed_blk.shape
        # This shard's slice of the global flat lane index space.
        lo = jax.lax.axis_index(reads_axis) * rows_blk * m
        rel = idx - lo
        ok = (rel >= 0) & (rel < rows_blk * m)
        relc = jnp.clip(rel, 0, rows_blk * m - 1)
        flat = lane.reshape(lane.shape[0], -1)  # (C/dc, rows_blk*m)
        vals = jnp.where(ok[None, :], jnp.take(flat, relc, axis=1), 0)
        local = vals.sum(axis=1, dtype=jnp.int32)  # (C/dc,)
        return jax.lax.psum(local, reads_axis)

    return block(packed, windows, start_idx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "reads_axis", "refs_axis", "kernel_params", "unroll",
        "interleaved", "interpret",
    ),
)
def _sharded_varlen_call(
    packed,
    win4,
    nb,
    start_phys,
    *,
    mesh: Mesh,
    reads_axis,
    refs_axis,
    kernel_params,
    unroll,
    interleaved,
    interpret,
):
    """shard_map'd VARLEN packed dispatch (the round-3 hot path, sharded):
    packed read rows over ``reads_axis``, byte-packed window tables and
    per-ref loop bounds over ``refs_axis``; per-row-shard partial totals
    meet in a psum.  ``start_phys`` carries PHYSICAL flat lane indices
    (the interleaved layout's index mapping is done host-side, so no
    de-interleave pass runs on device at all).

    The jit wrapper is load-bearing: an UN-jitted wrapper builds a fresh
    shard_map callable per dispatch, which re-enters the (remote)
    compile service every call — measured ~12 s PER DISPATCH flat
    through the axon tunnel at corpus scale, swamping the ~50 ms kernel.
    """
    from sparksmithwaterman_tpu.ops.pallas_score import _varlen_call

    km, kmm, kg, rb = kernel_params

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(reads_axis, None),
            P(refs_axis, None, None),
            P(refs_axis),
            P(),
        ),
        out_specs=P(refs_axis),
        check_vma=False,
    )
    def block(packed_blk, win4_blk, nb_blk, idx):
        lane = _varlen_call(
            nb_blk, packed_blk, win4_blk,
            match=km, mismatch=kmm, gap=kg, read_block=rb,
            unroll=unroll, interleaved=interleaved, interpret=interpret,
        )
        rows_blk, m = packed_blk.shape
        lo = jax.lax.axis_index(reads_axis) * rows_blk * m
        rel = idx - lo
        ok = (rel >= 0) & (rel < rows_blk * m)
        relc = jnp.clip(rel, 0, rows_blk * m - 1)
        flat = lane.reshape(lane.shape[0], -1)  # (C/dc, rows_blk*m)
        vals = jnp.where(ok[None, :], jnp.take(flat, relc, axis=1), 0)
        local = vals.sum(axis=1, dtype=jnp.int32)  # (C/dc,)
        return jax.lax.psum(local, reads_axis)

    return block(packed, win4, nb, start_phys)


@functools.partial(
    jax.jit, static_argnames=("mesh", "reads_axis", "refs_axis")
)
def _sharded_totals_lax_call(
    reads, refs, match, mismatch, gap, *, mesh: Mesh, reads_axis, refs_axis
):
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

    return block(reads, refs, match, mismatch, gap)


def _c_pad_fusable(c: int, dc: int, ladder: bool = True) -> int:
    """Ref-count padding that keeps the window-build column stack
    FUSED by XLA.

    Measured on v5e (remote compile, m=256, t4=1088): the
    `_diag_windows_packed4`/`_diag_windows` stack fuses at small C and
    at C a multiple of 128 (384/512/640 compile; 448/456/480/488/496/
    520/576 request ~65 GB of 128x-padded per-column temps and OOM the
    compile).  The single-device path never hits this because its
    1.5-mantissa ladder's values above 256 are all multiples of 128;
    this mirrors that for the mesh (rounded up to the 8*dc shard
    multiple — above 256, to lcm(8*dc, 128)).

    ``ladder=True`` additionally quantizes to the 1.5-mantissa ladder
    (fewer compile shapes) — right for the VARLEN kernel, whose pad
    refs run one loop body each (~free).  The grouped TABLE kernel
    pays a FULL diagonal sweep per pad ref, so its call site passes
    ``ladder=False`` to pad only as far as the fusion constraint
    forces (e.g. C=530 pads to 640, not the ladder's 768).
    """
    import math

    from sparksmithwaterman_tpu.models.batch_backend import _quantize_15

    mult = 8 * dc
    q = _quantize_15(max(c, 8), 8) if ladder else max(c, 8)
    if q <= 256:
        return -(-q // mult) * mult
    step = mult * 128 // math.gcd(mult, 128)
    return -(-q // step) * step


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

            n = len(jax.local_devices())  # per-process ICI mesh
            if config.strategy == "shard_reads":
                mesh = build_mesh((1, n))
            else:
                mesh = build_mesh((n, 1))
        self.mesh = mesh
        self._dr = mesh.shape["reads"]
        self._dc = mesh.shape["refs"]
        # Packed rows must shard evenly over the reads axis with every
        # shard's row count a multiple of 8 (Pallas grid divisor).
        self._pack_row_multiple = 8 * self._dr

    def _shard_pad(self, reads_enc: np.ndarray, refs_enc: np.ndarray):
        """Pad both batch axes to mesh-divisible quantized row counts.

        Reads quantize on the 1.5-mantissa ladder with base ``8 * dr``
        so every shard's row count stays a multiple of 8 (the Pallas
        grid divisor); refs to ``8 * dc`` powers.  Returns the padded
        arrays plus the static kernel params (read_block resolved per
        SHARD by the same calibrated model as the single-device path).
        """
        from sparksmithwaterman_tpu.models.batch_backend import (
            _pad_rows,
            _quantize,
            _quantize_15,
        )
        from sparksmithwaterman_tpu.ops.pallas_score import diag_read_block

        r, c = reads_enc.shape[0], refs_enc.shape[0]
        reads_p = _pad_rows(
            reads_enc, _quantize_15(r, 8 * self._dr), READ_PAD
        )
        refs_p = _pad_rows(refs_enc, _quantize(c, 8 * self._dc), REF_PAD)
        kernel_params = None
        if self.use_pallas and self.kernel == "diag":
            shard_r = reads_p.shape[0] // self._dr
            rb = diag_read_block(shard_r, reads_p.shape[1])
            kernel_params = self._params_static + (rb,)
        return reads_p, refs_p, kernel_params

    def _score_grid_dev(self, reads_enc: np.ndarray, refs_enc: np.ndarray):
        reads_p, refs_p, kernel_params = self._shard_pad(reads_enc, refs_enc)
        return sharded_score_grid(
            reads_p,
            refs_p,
            *self._params,
            mesh=self.mesh,
            kernel_params=kernel_params,
        )

    def _col_sums_dev(self, reads_enc: np.ndarray, refs_enc: np.ndarray):
        """Device-resident partial-total merge: every device sums its
        read-shard's scores and the shards meet in a psum over the
        reads axis — the sharded hot path of ``totals`` (the executor
        dispatch of ``src/sw/Distribution.java:337-353``, minus its
        driver-side collect)."""
        reads_p, refs_p, kernel_params = self._shard_pad(reads_enc, refs_enc)
        return sharded_totals(
            reads_p,
            refs_p,
            *self._params,
            mesh=self.mesh,
            kernel_params=kernel_params,
        )

    def _packed_col_sums(self, pack: dict, refs_enc: np.ndarray):
        """Sharded packed dispatch (the single-device override would
        silently compute off-mesh — the exact round-1 defect class).

        Packed rows shard over the reads axis, the (sharded-built)
        window tables over the refs axis; per-row-shard partial totals
        psum inside ``_sharded_packed_call``.  On non-TPU backends the
        packed path is never taken (use_pallas gates it), so the lax
        sharded path keeps CPU-mesh coverage.

        On a 1-device mesh this delegates to the single-device override
        — NOT the round-1 defect (there is nothing to shard): the
        BatchBackend path brings the round-5 multi-ref FOLD and the
        byte-packed window, which this grouped mesh form lacks (its
        unpacked table is 4x larger and its serial chains run unfolded
        — the 54-GCUPS class on long-ref corpora).  Real meshes keep
        the sharded grouped form for this fallback; its workloads
        (varlen-plan failures: very long refs) are also exactly where
        ``shard_seq`` is the intended strategy.
        """
        from sparksmithwaterman_tpu.models.batch_backend import _pad_rows

        if self.mesh.size == 1:
            return super()._packed_col_sums(pack, refs_enc)

        m_pack = pack["m_pack"]
        shard_rows = pack["rows"] // self._dr
        rb = self._pack_read_block(shard_rows, m_pack)
        # ladder=False: each pad ref here costs a full table-kernel
        # diagonal sweep, so pad only as far as fusion safety forces.
        c_pad = _c_pad_fusable(refs_enc.shape[0], self._dc, ladder=False)
        refs_p = _pad_rows(refs_enc, c_pad, REF_PAD)
        n_pad = refs_p.shape[1]
        plan = _kernel_plan(rb, m_pack, n_pad)
        packed_sharded = jax.device_put(
            pack["packed"],
            jax.sharding.NamedSharding(self.mesh, P("reads", None)),
        )
        windows = _sharded_windows(
            refs_p, self.mesh, "refs", m_pack, plan["t_pad"]
        )
        return _sharded_packed_call(
            packed_sharded,
            windows,
            jnp.asarray(pack["start_idx"]),
            mesh=self.mesh,
            reads_axis="reads",
            refs_axis="refs",
            kernel_params=self._params_static + (rb,),
            plan=tuple(sorted(plan.items())),
            interpret=False,
        )

    def _packed_col_sums_varlen(
        self, pack: dict, refs_enc: np.ndarray, lens: np.ndarray,
        c_target: int = 0,
    ):
        """Sharded varlen dispatch: the round-3 hot path on the mesh
        (the single-device override would silently compute off-mesh —
        the round-1 defect class, same reasoning as _packed_col_sums).

        ``c_target``: canonical tail-chunk padding, see the
        single-device override.
        """
        from jax.sharding import NamedSharding

        from sparksmithwaterman_tpu.models.batch_backend import _pad_rows
        from sparksmithwaterman_tpu.ops.pallas_score import (
            _diag_windows_packed4,
            _ilv_jit,
            plan_varlen,
            varlen_start_phys,
        )

        m_pack = pack["m_pack"]
        shard_rows = pack["rows"] // self._dr
        rb = self._pack_read_block(shard_rows, m_pack)
        c_pad = _c_pad_fusable(max(refs_enc.shape[0], c_target), self._dc)
        refs_p = _pad_rows(refs_enc, c_pad, REF_PAD)
        lens_p = np.concatenate(
            [np.asarray(lens, np.int32),
             np.zeros(c_pad - len(lens), np.int32)]
        )
        plan = plan_varlen(rb, m_pack, refs_p.shape[1], 64)
        if plan is None:
            # Same giant-read fallback as the single-device override.
            return self._packed_col_sums(pack, refs_enc)
        u, t4 = plan
        # Padding refs (lens == 0) run ONE body — all-REF_PAD windows
        # score 0 regardless (same rationale as the single-device path).
        nb = np.where(
            lens_p > 0, -(-(m_pack + lens_p - 1) // u), 1
        ).astype(np.int32)
        # Window build: PLAIN single-device jit.  Under the SPMD
        # partitioner (sharded input jit, or the same build inside
        # shard_map) the packed4 column stack stops fusing and
        # materializes one 128x-padded (C, T4, 1) temp per lane —
        # measured 65 GB requested at C=481, a compile-time HBM OOM —
        # while the default-device program fuses the stack at the same
        # shape.  The table and the cached packed reads are handed to
        # the sharded call AS-IS: the jit reshards device arrays ON
        # DEVICE (an ICI scatter on a real pod, a no-op on a 1-device
        # mesh).  Never `device_put` a device-RESIDENT array onto a
        # NamedSharding here — through the axon tunnel that round-trips
        # the ~570 MB table via the HOST: measured ~12 s per dispatch,
        # ~80x the kernel itself (round-4 corpus run).
        # Upload the uint8 codes and widen ON DEVICE — a host-side
        # astype(int32) quadruples the tunnel upload bytes per dispatch.
        # The window builds directly in the interleaved lane order (no
        # separate transpose pass; see _diag_windows_packed4).
        ilv = m_pack % 128 == 0 and m_pack // 128 > 1
        win4 = _diag_windows_packed4(
            jnp.asarray(refs_p).astype(jnp.int32), m_pack, t4, ilv=ilv
        )
        packed_sharded = pack["packed"]
        si = np.asarray(pack["start_idx"])
        if ilv:
            packed_sharded = _ilv_jit(packed_sharded)
            # Map the gather indices to the interleaved layout instead
            # of de-interleaving the kernel output on device.
            si = varlen_start_phys(si, m_pack)
        # nb is host-resident — this device_put is a plain (tiny) upload.
        nb_sharded = jax.device_put(
            nb, NamedSharding(self.mesh, P("refs"))
        )
        return _sharded_varlen_call(
            packed_sharded,
            win4,
            nb_sharded,
            jnp.asarray(si),
            mesh=self.mesh,
            reads_axis="reads",
            refs_axis="refs",
            kernel_params=self._params_static + (rb,),
            unroll=u,
            interleaved=ilv,
            interpret=False,
        )
