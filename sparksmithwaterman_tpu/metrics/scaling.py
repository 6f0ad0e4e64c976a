"""Multi-device scaling-efficiency harness.

The reference's distributed experiments measured wall-clock per input
file on a Spark cluster and left the numbers in scattered reports
(``src/metrics/ExecutionTimes*.java``; no results are committed).  This
harness measures the TPU-native equivalent directly: the device-resident
``sharded_totals`` hot path on meshes of increasing size, reporting
cells/s and the scaling efficiency ``rate_n / (n * rate_1)`` —
BASELINE.md's >= 80% multi-host target, measurable on real pods and
mechanically validated on virtual CPU meshes
(``--xla_force_host_platform_device_count``).

The refs axis is scaled (the reference's DistributeReference strategy,
``src/sw/Distribution.java:227-373``): reference shards are independent,
so ideal scaling is linear and any gap is runtime overhead, not
algorithmic communication.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.parallel.engine import sharded_totals
from sparksmithwaterman_tpu.parallel.mesh import build_mesh


def _workload(num_reads: int, read_len: int, num_refs: int, ref_len: int):
    rng = np.random.default_rng(0)
    alphabet = np.array(list("ACGT"))
    reads = ["".join(rng.choice(alphabet, size=read_len)) for _ in range(num_reads)]
    refs = ["".join(rng.choice(alphabet, size=ref_len)) for _ in range(num_refs)]
    return (
        encode_batch(reads, read_len, READ_PAD),
        encode_batch(refs, ref_len, REF_PAD),
    )


def measure_scaling(
    device_counts: Optional[Sequence[int]] = None,
    *,
    num_reads: int = 32,
    read_len: int = 64,
    num_refs: int = 64,
    ref_len: int = 512,
    iters: int = 3,
    params=(5, -3, -4),
    axis: str = "refs",
) -> List[Dict]:
    """Strong-scaling sweep over a mesh axis.

    ``axis='refs'``: ``sharded_totals`` with the reference set sharded
    (embarrassingly parallel — ideal scaling is linear, any gap is
    runtime overhead).  ``axis='seq'``: ONE reference of ``ref_len`` bp
    length-sharded over the devices (``parallel/seqparallel.py``) — the
    communication-bound axis, whose efficiency measures the ppermute
    boundary exchange + pipeline fill cost.

    Fixed total workload; each row reports the measured rate and the
    efficiency vs the single-device rate.  ``num_refs`` must divide by
    every requested device count.
    """
    if axis == "seq":
        return _measure_scaling_seq(
            device_counts,
            num_reads=num_reads,
            read_len=read_len,
            ref_len=ref_len,
            iters=iters,
            params=params,
        )
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    reads_enc, refs_enc = _workload(num_reads, read_len, num_refs, ref_len)
    cells = num_reads * read_len * num_refs * ref_len
    p = tuple(np.int32(v) for v in params)
    kernel_params = None
    if jax.default_backend() == "tpu":
        rb = min(256, num_reads)
        if num_reads % rb == 0:
            kernel_params = tuple(int(v) for v in params) + (rb,)

    rows: List[Dict] = []
    base_rate = None
    want = None
    for n in device_counts:
        if n > n_avail:
            continue
        if num_refs % n:
            raise ValueError(f"num_refs={num_refs} must divide by devices={n}")
        mesh = build_mesh((n, 1), n_devices=n)
        run = lambda: sharded_totals(
            reads_enc, refs_enc, *p, mesh=mesh, kernel_params=kernel_params
        )
        out = np.asarray(run())  # compile + settle
        if want is None:
            want = out
        elif not np.array_equal(out, want):
            raise AssertionError(f"totals diverge at {n} devices")
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run()
        np.asarray(r)
        dt = (time.perf_counter() - t0) / iters
        rate = cells / dt
        if base_rate is None:
            base_rate = rate
        rows.append(
            {
                "devices": n,
                "seconds": round(dt, 6),
                "gcups": round(rate / 1e9, 3),
                "efficiency": round(rate / (n * base_rate), 3),
            }
        )
    return rows


def _measure_scaling_seq(
    device_counts: Optional[Sequence[int]],
    *,
    num_reads: int,
    read_len: int,
    ref_len: int,
    iters: int,
    params,
) -> List[Dict]:
    from sparksmithwaterman_tpu.parallel.seqparallel import seqparallel_scores

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    reads_enc, refs_enc = _workload(num_reads, read_len, 1, ref_len)
    ref_enc = refs_enc[0]
    cells = num_reads * read_len * ref_len

    rows: List[Dict] = []
    base_rate = None
    want = None
    for n in device_counts:
        if n > n_avail:
            continue
        if ref_len % n:
            raise ValueError(f"ref_len={ref_len} must divide by devices={n}")
        mesh = build_mesh((n,), axis_names=("seq",), n_devices=n)
        run = lambda: seqparallel_scores(
            reads_enc, ref_enc, *[int(v) for v in params], mesh=mesh
        )
        out = np.asarray(run())  # compile + settle
        if want is None:
            want = out
        elif not np.array_equal(out, want):
            raise AssertionError(f"seq-parallel scores diverge at {n} devices")
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run()
        np.asarray(r)
        dt = (time.perf_counter() - t0) / iters
        rate = cells / dt
        if base_rate is None:
            base_rate = rate
        rows.append(
            {
                "devices": n,
                "seconds": round(dt, 6),
                "gcups": round(rate / 1e9, 3),
                "efficiency": round(rate / (n * base_rate), 3),
            }
        )
    return rows
