"""Long-reference mode: windowed traceback for 100kb+ references.

The reference's only long-sequence mechanism is the wavefront
decomposition with full O(m*n) score+align matrices
(``src/sw/DistributedSW.java:83-84``) — ~2kb refs never stress it.  For
100kb+ references (BASELINE config 5) materializing the traceback fill
is wasteful: this module

1. finds every maximum cell on device (``find_max_cells`` — H is
   scanned row-wise, max cells extracted with a fixed-capacity argwhere),
2. re-fills only a **window** of ref columns ending at each max cell
   (``sites_for_pair_long``), and walks it with the native tracer.

Window soundness: an alignment path with score >= 1 satisfies
``5*matches - 3*mismatches - 4*gaps >= 1`` with ``matches <= m``, so the
ref-column span ``matches + mismatches + deletions`` is < ``m + 5m/3 =
8m/3``.  A window of ``ceil(8m/3) + 2`` columns therefore contains the
whole path; the window's left boundary behaves exactly like a fresh
matrix edge (H == 0 there, because any window wide enough has H decayed
to 0 left of the path).  Windows are left-padded to one static width so
every max cell reuses one compiled fill shape.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.io.report import Site
from sparksmithwaterman_tpu.ops.recurrence import _row_update, _sub_scores, fill_pairs
from sparksmithwaterman_tpu.ops.traceback import sites_from_fill


@functools.partial(jax.jit, static_argnames=("capacity",))
def _max_cells_device(read_enc, ref_enc, match, mismatch, gap, capacity: int):
    """(best, count, cells) for ONE pair; cells is (capacity, 2) int32
    row-major (i, j) 0-based positions of H == best, -1-filled."""
    n = ref_enc.shape[-1]
    ramp = gap * jnp.arange(n, dtype=jnp.int32)
    ref_i = ref_enc.astype(jnp.int32)[None, :]  # (1, N)

    def body(h_prev, read_char):
        sub = _sub_scores(ref_i, read_char[None, None].astype(jnp.int32), match, mismatch)
        h, _, _ = _row_update(h_prev, sub, gap, ramp)
        return h, h[0]

    _, h_all = jax.lax.scan(body, jnp.zeros((1, n), jnp.int32), read_enc)
    best = jnp.max(h_all)
    cells = jnp.argwhere(h_all == best, size=capacity, fill_value=-1)
    count = jnp.sum(h_all == best)
    return best, count, cells.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _max_cells_device_batch(
    reads_enc, ref_enc, match, mismatch, gap, capacity: int
):
    """Batched `_max_cells_device`: (R, m) reads vs ONE ref.

    Returns (best (R,), count (R,), cells (R, capacity, 2)).  Pad rows
    (read code 0 matches nothing) strictly decay for best > 0, so they
    never contribute max cells."""
    n = ref_enc.shape[-1]
    r = reads_enc.shape[0]
    ramp = gap * jnp.arange(n, dtype=jnp.int32)
    ref_i = ref_enc.astype(jnp.int32)[None, :]  # (1, N)

    def body(h_prev, read_col):  # read_col: (R,)
        sub = _sub_scores(
            ref_i, read_col[:, None].astype(jnp.int32), match, mismatch
        )
        h, _, _ = _row_update(h_prev, sub, gap, ramp)
        return h, h

    _, h_all = jax.lax.scan(
        body, jnp.zeros((r, n), jnp.int32), reads_enc.T
    )  # (m, R, n)
    best = jnp.max(h_all, axis=(0, 2))
    eq = h_all == best[None, :, None]
    count = jnp.sum(eq, axis=(0, 2))
    eqt = jnp.swapaxes(eq, 0, 1)  # (R, m, n)
    cells = jax.vmap(
        lambda e: jnp.argwhere(e, size=capacity, fill_value=-1)
    )(eqt)
    return best, count, cells.astype(jnp.int32)


# Device argwhere capacity ceiling: past this, the doubling loop's
# (R, capacity, 2) cell arrays and per-doubling recompiles cost more
# than an exact host row-scan (a repetitive read against a 131 kb ref
# can tie at millions of cells — each doubling is a fresh compile
# through the remote service).
_CAPACITY_CAP = 1 << 15


def _max_cells_host(read_enc, ref_enc, match, mismatch, gap):
    """Exact host row-scan: (best, cells) with UNBOUNDED tie capacity.

    Mirrors ``_row_update``'s linear-gap prefix-max recurrence in two
    NumPy passes (find best, then collect row-major max cells) so memory
    stays O(n) regardless of tie count."""
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    ref_i = ref_enc.astype(np.int64)
    n = ref_i.shape[-1]
    ramp = gap * np.arange(n, dtype=np.int64)

    def rows():
        h = np.zeros(n, np.int64)
        for i in range(read_enc.shape[-1]):
            sub = np.where(ref_i == int(read_enc[i]), match, mismatch)
            nw = np.concatenate(([0], h[:-1])) + sub
            cand = np.maximum(np.maximum(nw, h + gap), 0)
            h = np.maximum.accumulate(cand - ramp) + ramp
            yield i, h

    best = 0
    for _, h in rows():
        best = max(best, int(h.max()))
    if best <= 0:
        return 0, np.empty((0, 2), np.int32)
    parts = []
    for i, h in rows():
        js = np.flatnonzero(h == best)
        if js.size:
            parts.append(
                np.stack([np.full(js.size, i, np.int32), js], axis=1)
            )
    cells = (
        np.concatenate(parts, axis=0).astype(np.int32)
        if parts
        else np.empty((0, 2), np.int32)
    )
    return best, cells


def find_max_cells(
    read_seq: str, ref_seq: str, params, capacity: int = 1024
) -> Tuple[int, np.ndarray]:
    """All (i, j) max cells (0-based, row-major) of one pair.

    Capacity doubles until every tie fits (ties beyond a handful are
    rare on non-degenerate data); past ``_CAPACITY_CAP`` the exact host
    row-scan takes over instead of minting ever-larger compiles.
    """
    m, n = len(read_seq), len(ref_seq)
    read_enc = encode_batch([read_seq], m, READ_PAD)[0]
    ref_enc = encode_batch([ref_seq], n, REF_PAD)[0]
    while True:
        best, count, cells = _max_cells_device(
            read_enc, ref_enc, *params, capacity=capacity
        )
        best, count = int(best), int(count)
        if count <= capacity:
            cells = np.asarray(cells)[:count]
            return best, cells
        if capacity >= _CAPACITY_CAP:
            best, cells = _max_cells_host(read_enc, ref_enc, *params)
            return best, cells
        capacity *= 2


def find_max_cells_batched(
    reads: List[str],
    ref_seq: str,
    params,
    *,
    backend: str = "auto",
    read_block: int = 256,
    interpret: bool = False,
) -> List[Tuple[int, np.ndarray]]:
    """Per-read (best, max-cells) of a whole read batch vs ONE long ref.

    On TPU this replaces R sequential row-scan dispatches with one
    chunked wavefront argmax kernel pass
    (``pallas_argmax_grid_diag_chunked``): each read-position lane
    reports (row best, first diagonal reaching it, tie count).  A read's
    max cells are reconstructed exactly as (lane, bestd - lane) for the
    lanes hitting the global best when every such lane has tie count 1;
    a read with an in-lane tie (count > 1 — multiple co-optimal cells in
    one DP row) falls back to the exact scan, preserving the all-co-
    optimal-cells contract (``SmithWaterman.java:176-185``).

    backend: 'auto' (kernel on TPU, scan elsewhere), 'pallas', 'scan'.
    """
    import jax

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "scan":
        return [find_max_cells(read, ref_seq, params) for read in reads]

    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_argmax_grid_diag_chunked,
    )

    m_pad = max(8, -(-max(len(r) for r in reads) // 8) * 8)
    r_q = 8
    while r_q < len(reads):
        r_q *= 2
    reads_enc = encode_batch(reads, m_pad, READ_PAD)
    if reads_enc.shape[0] < r_q:
        pad = np.full((r_q - reads_enc.shape[0], m_pad), READ_PAD, np.uint8)
        reads_enc = np.concatenate([reads_enc, pad], axis=0)
    ref_enc = encode_batch([ref_seq], len(ref_seq), REF_PAD)
    rb = min(read_block, r_q)
    # Scoped-VMEM guard: the argmax body carries THREE extra (rb, m)
    # values (best, bestd, count) plus two masks through the unrolled
    # diagonal chain — roughly 2-3x the score kernel's stack per row.
    # rb=256 x m=152 compiled to a 22.5 MB scoped stack (16 MB limit)
    # when the round-5 read-scale gate first routed 2k-read sets here;
    # capping rb * m keeps the stack in budget (chunked wall time is
    # nearly flat in rb, so smaller blocks only add grid iterations).
    while rb > 8 and rb * m_pad > 16384:
        rb //= 2
    best, bestd, count = pallas_argmax_grid_diag_chunked(
        reads_enc,
        ref_enc,
        *(int(p) for p in params),
        read_block=rb,
        interpret=interpret,
    )
    best = np.asarray(best)[: len(reads), 0]    # (R, M) per-lane best
    bestd = np.asarray(bestd)[: len(reads), 0]
    count = np.asarray(count)[: len(reads), 0]

    out: List[Tuple[int, np.ndarray] | None] = []
    ties: List[int] = []
    for ridx, read in enumerate(reads):
        b = int(best[ridx].max())
        if b == 0:
            out.append((0, np.empty((0, 2), np.int32)))
            continue
        lanes = np.flatnonzero(best[ridx] == b)
        if (count[ridx, lanes] != 1).any():
            out.append(None)
            ties.append(ridx)
            continue
        cells = np.stack(
            [lanes, bestd[ridx, lanes] - lanes], axis=1
        ).astype(np.int32)
        out.append((b, cells))
    if ties:
        # Exact-position fallback for reads with an in-lane tie,
        # BATCHED: the per-read scan costs seconds each against a
        # 131 kb ref (measured ~2.5 s/read; random low-score reads tie
        # often), so groups of reads share one scan.  Group size bounds
        # the (m, R, n) H stack (~270 MB at m=128, R=4, n=131k).
        group = max(1, (1 << 26) // max(1, m_pad * len(ref_seq)))
        ref_full = encode_batch([ref_seq], len(ref_seq), REF_PAD)[0]
        for start in range(0, len(ties), group):
            g = ties[start : start + group]
            genc = encode_batch([reads[i] for i in g], m_pad, READ_PAD)
            capacity = 1024
            while True:
                b_g, c_g, cells_g = _max_cells_device_batch(
                    genc, ref_full, *params, capacity=capacity
                )
                b_g, c_g = np.asarray(b_g), np.asarray(c_g)
                if (c_g <= capacity).all() or capacity >= _CAPACITY_CAP:
                    break
                capacity *= 2
            cells_g = np.asarray(cells_g)
            for k, ridx in enumerate(g):
                if int(c_g[k]) > capacity:
                    # Tie count past the device cap (degenerate
                    # repetitive read): exact host row-scan, O(n)
                    # memory, no recompile ladder.
                    out[ridx] = _max_cells_host(
                        genc[k], ref_full, *params
                    )
                else:
                    out[ridx] = (int(b_g[k]), cells_g[k][: int(c_g[k])])
    return out


def window_width(m: int, n: int) -> int:
    """Static ref-column window provably containing any path of a
    length-m read (see module docstring)."""
    return min(n, (8 * m) // 3 + 2)


def sites_for_pair_long(
    ref_seq: str,
    read_seq: str,
    params,
    gap_char: str = "_",
    ref_bucket: int = 256,
    max_cells: Tuple[int, np.ndarray] | None = None,
    tie_semantics: str = "serial",
) -> List[Site]:
    """All optimal sites of one (read, long-ref) pair without an O(m*n)
    traceback fill.  Output order matches the oracle (row-major max-cell
    discovery, ``SmithWaterman.java:176-185``).

    ``max_cells``: precomputed (best, cells) — e.g. one element of
    :func:`find_max_cells_batched` — to skip the per-pair search.
    ``tie_semantics``: tied-path direction engine (see
    ``ops.recurrence.fill_pairs``); max cells and scores are engine-
    independent, only the walked strings differ.
    """
    m, n = len(read_seq), len(ref_seq)
    if m == 0 or n == 0:
        return []
    best, cells = (
        max_cells if max_cells is not None
        else find_max_cells(read_seq, ref_seq, params)
    )
    if best == 0:
        # Degenerate all-zero matrix: every cell "ties" (oracle parity,
        # capped for long refs — see ops/traceback.degenerate_sites).
        from sparksmithwaterman_tpu.ops.traceback import degenerate_sites

        return degenerate_sites(m, n)

    w = window_width(m, n)
    w_pad = max(ref_bucket, -(-w // ref_bucket) * ref_bucket)
    m_pad = len(read_seq)

    # One window per max cell, left-padded to the static width (pad code
    # REF_PAD matches nothing, so the padded prefix keeps H == 0 — the
    # same boundary condition as a true matrix edge).  The batch axis is
    # quantized so tie-count jitter reuses one compiled fill.
    k = cells.shape[0]
    k_q = 8
    while k_q < k:
        k_q *= 2
    windows = np.full((k_q, w_pad), REF_PAD, np.uint8)
    read_win = encode_batch([read_seq] * k_q, m_pad, READ_PAD)
    ends = []
    for t, (ci, cj) in enumerate(cells):
        j = int(cj) + 1  # 1-based end column
        j0 = max(0, j - w)
        chunk = encode_batch([ref_seq[j0:j]], j - j0, REF_PAD)[0]
        windows[t, w_pad - (j - j0) :] = chunk
        ends.append(j)

    h, dirs = fill_pairs(
        read_win, jnp.asarray(windows), *params, tie_semantics=tie_semantics
    )
    h, dirs = np.asarray(h), np.asarray(dirs)

    sites: List[Site] = []
    for t, (ci, cj) in enumerate(cells):
        j = ends[t]
        i = int(ci) + 1
        # The max cell sits at window column w_pad; window column c
        # (1-based) maps to true ref column c + j - w_pad.  Ref chars are
        # sliced from the ORIGINAL string so mixed-case input round-trips
        # (the oracle emits raw chars; encode upper-cases for compare).
        begin_w, aligned = _walk_window(
            dirs[t], i, w_pad, ref_seq, j - w_pad, read_seq, gap_char
        )
        sites.append((begin_w + j - w_pad, aligned))
    return sites


@functools.partial(jax.jit, static_argnames=("cap", "tie_semantics"))
def _fill_walk_known(
    read_win, windows, cells, match, mismatch, gap, *, cap, tie_semantics
):
    """Window fill + ON-DEVICE walk of one KNOWN max cell per pair.

    Returns (begins, codes): (B,) window-coordinate 1-based start
    columns and (B, cap) int8 walk codes.  Fetching these instead of
    the (B, M, W) int8 direction planes matters through a remote-TPU
    tunnel: the planes are ~40 MB per 512-job block (~1.2 s each at
    tunnel bandwidth — the round-5 read-scale profile measured the
    dirs fetch as the whole path's wall), the codes are ~0.3 MB.
    """
    from sparksmithwaterman_tpu.ops.device_traceback import _trace_one

    _h, dirs = fill_pairs(
        read_win, windows, match, mismatch, gap,
        tie_semantics=tie_semantics,
    )
    return jax.vmap(lambda d, c: _trace_one(d, c, cap))(dirs, cells)


def sites_for_ref_long_batched(
    ref_seq: str,
    reads: List[str],
    params,
    *,
    gap_char: str = "_",
    ref_bucket: int = 256,
    cell_lists: List[Tuple[int, np.ndarray]],
    tie_semantics: str = "serial",
) -> List[List[Site]]:
    """Per-read site lists vs ONE long reference, with EVERY read's
    max-cell windows filled AND walked in batched device dispatches.

    The per-read :func:`sites_for_pair_long` loop costs one window-fill
    dispatch + one fetch round trip PER READ (measured ~1.1 s/read
    through a remote-TPU tunnel — 90 s to trace 64 reads against a
    131 kb reference); this form collects all reads' windows into
    shape-quantized batches, walks each job's (single, known) max cell
    on device, and fetches only (begin, codes) per job — the host then
    assembles strings vectorized.  Site order per read = row-major
    max-cell discovery, same as the per-read path.
    """
    n = len(ref_seq)
    out: List[List[Site]] = [[] for _ in reads]
    m_max = max((len(r) for r in reads), default=0)
    if m_max == 0 or n == 0:
        return out
    w = window_width(m_max, n)
    w_pad = max(ref_bucket, -(-w // ref_bucket) * ref_bucket)

    # (read_idx, end_col_1based) per window, in per-read row-major
    # max-cell order.
    jobs: List[Tuple[int, int, int]] = []  # (ridx, i_1based, end_j)
    for ridx, read in enumerate(reads):
        best, cells = cell_lists[ridx]
        if best == 0:
            from sparksmithwaterman_tpu.ops.traceback import (
                degenerate_sites,
            )

            out[ridx] = degenerate_sites(len(read), n)
            continue
        for ci, cj in cells:
            jobs.append((ridx, int(ci) + 1, int(cj) + 1))

    if not jobs:
        return out

    sites_per_job: List[Site] = []
    # One batched fill+walk per ~quantized job block (8 * 2^k rows).
    # Walk cap: every step consumes a read row or a window column, so
    # m_max + w_pad bounds any path inside the window.
    cap = m_max + w_pad
    block = 512
    dispatched = []
    for start in range(0, len(jobs), block):
        chunk = jobs[start : start + block]
        k_q = 8
        while k_q < len(chunk):
            k_q *= 2
        windows = np.full((k_q, w_pad), REF_PAD, np.uint8)
        read_rows = [""] * k_q
        cells = np.zeros((k_q, 2), np.int32)
        for t, (ridx, i, j) in enumerate(chunk):
            j0 = max(0, j - w)
            windows[t, w_pad - (j - j0) :] = encode_batch(
                [ref_seq[j0:j]], j - j0, REF_PAD
            )[0]
            read_rows[t] = reads[ridx]
            cells[t] = (i - 1, w_pad - 1)  # 0-based max cell in window
        read_win = encode_batch(read_rows, m_max, READ_PAD)
        outs = _fill_walk_known(
            read_win, jnp.asarray(windows), jnp.asarray(cells), *params,
            cap=cap, tie_semantics=tie_semantics,
        )
        dispatched.append((chunk, outs))
        # Backpressure: every queued fill's transient (k_q, m_max,
        # w_pad) planes live in HBM until executed; a tie-heavy read
        # set can queue many blocks (the same unbounded-lead class
        # that OOM'd _dispatch_cols at ~28 in-flight window tables).
        # Waiting on the dispatch 4 back bounds live state while
        # keeping the pipeline full.
        if len(dispatched) >= 4:
            jax.block_until_ready(dispatched[-4][1])
    for _, outs in dispatched:
        for arr in outs:
            try:
                arr.copy_to_host_async()
            except Exception:  # pragma: no cover - backend-dependent
                break
    from sparksmithwaterman_tpu.ops.device_traceback import assemble_site

    for chunk, (begins, codes) in dispatched:
        begins, codes = np.asarray(begins), np.asarray(codes)
        for t, (ridx, i, j) in enumerate(chunk):
            off = j - w_pad  # window col c <-> ref col c + off
            beg_w = int(begins[t])
            sites_per_job.append(
                assemble_site(
                    codes[t],
                    beg_w + off if beg_w > 0 else 0,
                    (i - 1, j - 1),  # j_end in REAL ref coords: j_pos
                    # arithmetic inside assemble_site then indexes the
                    # original ref string directly
                    ref_seq,
                    reads[ridx],
                    gap_char,
                )
            )
    for (ridx, _i, _j), site in zip(jobs, sites_per_job):
        out[ridx].append(site)
    return out


def _walk_window(dirs, i, j, ref_seq, col_offset, read_seq, gap_char):
    """Traceback inside a window whose column c is ref column
    ``c + col_offset`` of the original sequence."""
    beginning = 0
    ref_parts: List[str] = []
    read_parts: List[str] = []
    while i > 0 and j > 0:
        d = dirs[i - 1, j - 1]
        if d == 0:
            break
        beginning = j
        if d == 1:  # align
            ref_parts.append(ref_seq[j + col_offset - 1])
            read_parts.append(read_seq[i - 1])
            i -= 1
            j -= 1
        elif d == 2:  # insertion
            ref_parts.append(gap_char)
            read_parts.append(read_seq[i - 1])
            i -= 1
        else:  # deletion
            ref_parts.append(ref_seq[j + col_offset - 1])
            read_parts.append(gap_char)
            j -= 1
    return beginning, ("".join(reversed(ref_parts)), "".join(reversed(read_parts)))
