"""Sequence parallelism: one reference sharded along its LENGTH.

The reference's only long-sequence mechanism is the intra-matrix
wavefront (``src/sw/DistributedSW.java:164-245``): anti-diagonals of one
DP matrix become parallel units, with S/E/SE score "broadcasts" carrying
the dependence between generations.  On TPU, the intra-chip version of
that wavefront is the Pallas kernel (:mod:`..ops.pallas_score`); this
module is the **cross-chip** version for references too long for one
core's VMEM: the reference sequence is sharded along its length over a
``seq`` mesh axis, and the DP recurrence crosses the segment boundary by
ring-passing the band-boundary column to the next chip with
``jax.lax.ppermute`` — the TPU-native restatement of the reference's
``Broadcast`` of S/E/SE neighbor scores (``src/sw/DistributedSW.java:364-417``),
riding ICI instead of a Spark collect.

Schedule (pipelined tile wavefront): the (M+1)x(N+1) DP matrix is tiled
into row *stripes* (height ``stripe``) x ref *segments* (one per chip).
Chip ``k`` processes stripe ``s`` of its segment in round ``t = s + k``;
the boundary it needs — column ``H[:, j0-1]`` for the stripe's rows plus
the corner ``H[i0-1, j0-1]`` — was produced by chip ``k-1`` in round
``t-1`` and arrives via a single ``ppermute`` hop per round.  After
``T + S - 1`` rounds every tile is filled; per-chip running maxima meet
in a ``pmax``.

Why passing one column suffices (linear gap): within a row,

    H[i][j] = max( max_{k<=j}(A[k] + gap*(j-k)),  Hb[i] + gap*(j+1) )

where ``A`` is the local candidate (align/insert/zero) and ``Hb[i]`` is
the left segment's last column — the W-chain contribution of *everything*
left of the boundary reaches the segment only through ``Hb[i]``, decaying
linearly.  So the cross-chip traffic is O(stripe) ints per round per
chip, independent of segment width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exports shard_map at top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.models.batch_backend import (
    _INT32_SAFE,
    _quantize_15,
)


def _device_fill(reads_t, seg_ref, match, mismatch, gap, *, stripe, axis):
    """Per-chip body: fill this chip's segment band, stripe by stripe.

    reads_t: (M, B) int32 read chars (replicated), M % stripe == 0.
    seg_ref: (Ns,) int32 local reference segment.
    Returns (B,) int32 global max scores (pmax'd, replicated).
    """
    m, b = reads_t.shape
    ns = seg_ref.shape[0]
    num_stripes = m // stripe
    k = jax.lax.axis_index(axis)
    size = jax.lax.psum(1, axis)
    rounds = num_stripes + size - 1

    ramp = gap * jnp.arange(ns, dtype=jnp.int32)
    # W-chain decay of the left-boundary column into local columns.
    left_ramp = gap * (jnp.arange(ns, dtype=jnp.int32) + 1)
    perm = [(i, i + 1) for i in range(size - 1)]  # chip 0 receives zeros

    def row_update(h_prev, xs):
        read_c, lcol, lprev = xs  # (B,), (B,), (B,)
        sub = jnp.where(
            seg_ref[None, :] == read_c[:, None], match, mismatch
        )
        nw = jnp.concatenate([lprev[:, None], h_prev[:, :-1]], axis=1)
        a = nw + sub
        ins = h_prev + gap
        cand = jnp.maximum(jnp.maximum(a, ins), 0)
        chain = jax.lax.cummax(cand - ramp, axis=1) + ramp
        h = jnp.maximum(chain, lcol[:, None] + left_ramp[None, :])
        return h, (h[:, -1], jnp.max(h, axis=1))

    def round_body(t, carry):
        h_prev, best, out_bound, corner = carry
        # Boundary produced by the left chip last round arrives this round.
        in_bound = jax.lax.ppermute(out_bound, axis, perm)  # (stripe, B)
        s = t - k
        active = jnp.logical_and(s >= 0, s < num_stripes)
        start = jnp.clip(s * stripe, 0, m - stripe)
        stripe_reads = jax.lax.dynamic_slice(
            reads_t, (start, 0), (stripe, b)
        )
        lprev_arr = jnp.concatenate(
            [corner[None, :], in_bound[:-1]], axis=0
        )
        h_new, (bounds, row_maxes) = jax.lax.scan(
            row_update, h_prev, (stripe_reads, in_bound, lprev_arr)
        )
        best_new = jnp.maximum(best, jnp.max(row_maxes, axis=0))
        # Inactive rounds must not disturb state: a chip that hasn't
        # started (s < 0) must keep emitting zero boundaries, and a chip
        # that finished (s >= num_stripes) must keep its band state.
        sel = lambda n, o: jnp.where(active, n, o)
        return (
            sel(h_new, h_prev),
            sel(best_new, best),
            jnp.where(active, bounds, jnp.zeros_like(bounds)),
            sel(in_bound[-1], corner),
        )

    init = (
        jnp.zeros((b, ns), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((stripe, b), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    _, best, _, _ = jax.lax.fori_loop(0, rounds, round_body, init)
    return jax.lax.pmax(best, axis)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "stripe")
)
def _seqp_call(reads, ref, match, mismatch, gap, *, mesh, axis, stripe):
    reads_t = reads.astype(jnp.int32).T  # (M, B)
    ref_i = ref.astype(jnp.int32)
    fn = shard_map(
        functools.partial(
            _device_fill, stripe=stripe, axis=axis
        ),
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        reads_t, ref_i,
        jnp.int32(match), jnp.int32(mismatch), jnp.int32(gap),
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "stripe")
)
def _seqp_call_batch(reads, refs, match, mismatch, gap, *, mesh, axis, stripe):
    """Batched form: C refs per dispatch (VERDICT r2 task 4 — the
    per-reference dispatch loop was the strategy's dominant overhead).

    The per-chip band fill is vmapped over the ref axis INSIDE the
    shard_map, so one dispatch fills C DP bands concurrently and the
    per-round ppermute carries a (C, stripe, B) boundary block — C
    boundary exchanges coalesced into one collective per round.
    """
    reads_t = reads.astype(jnp.int32).T  # (M, B)
    refs_i = refs.astype(jnp.int32)  # (C, N)

    def body(reads_t, refs_seg, m_, mm_, g_):
        fill = functools.partial(_device_fill, stripe=stripe, axis=axis)
        return jax.vmap(
            lambda seg: fill(reads_t, seg, m_, mm_, g_)
        )(refs_seg)  # (C, B)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        reads_t, refs_i,
        jnp.int32(match), jnp.int32(mismatch), jnp.int32(gap),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "mesh", "axis", "read_block",
        "unroll", "words", "t4", "ns_local", "interleaved", "interpret",
    ),
)
def _seqp_band_call(
    packed_i, refs_enc, si_phys, *, match, mismatch, gap, mesh, axis,
    read_block, unroll, words, t4, ns_local, interleaved, interpret,
):
    """(C, R) per-read best scores with every ref length-sharded and the
    in-band fill a PALLAS kernel (VERDICT r3 task 3) — the TPU-real form
    of the reference's DistributeAlgorithm wavefront
    (``src/sw/DistributedSW.java:118-252``).

    Pipelining is at whole-(ref, chip-band) granularity: in round ``t``
    chip ``k`` fills its segment band of ref ``t - k`` using the
    boundary column chip ``k-1`` emitted for that ref in round ``t-1``
    (one ``ppermute`` hop per round).  With C refs in flight the ring's
    fill/drain waste is (size-1)/(C+size-1) — the read-stripe schedule
    of the lax path is unnecessary because the banded kernel already
    exposes the whole band's parallelism to the VPU.

    ``packed_i``: (ROWS, M) int32 packed reads in the KERNEL layout
    (interleaved when M has multiple 128-lane tiles), replicated.
    ``refs_enc``: (C, N) uint8, N % size == 0, sharded P(None, axis).
    ``si_phys``: (R,) int32 flat gather indices in the kernel layout.
    """
    from sparksmithwaterman_tpu.ops.pallas_score import (
        _band_call,
        _windows_packed4_best,
    )

    rows, m = packed_i.shape

    def chip_body(packed_i, refs_seg, si_phys):
        k = jax.lax.axis_index(axis)
        size = jax.lax.psum(1, axis)
        c = refs_seg.shape[0]
        # Built per chip INSIDE the shard_map (parallel, no size-x
        # replication) — the SHEAR form: under the SPMD partitioner the
        # column-stack build materializes one 128x-padded (1, T4, 1)
        # temp per lane (65 MB each at a 0.5 Mb segment's T4=133k —
        # measured 16.3 GB HBM OOM on the round-5 mixed-long-ref
        # pipeline run), while the shear's intermediates keep T4 minor
        # and fuse.  The C<=256 chunk cap stays (engine._c_pad_fusable
        # documents the column build's other boundary).
        win4 = _windows_packed4_best(
            refs_seg.astype(jnp.int32), m, t4, ilv=interleaved
        )  # (C, T4, M) for THIS chip's segments, kernel lane order
        rounds = c + size - 1
        perm = [(i, i + 1) for i in range(size - 1)]
        r = si_phys.shape[0]

        def round_body(t, carry):
            bnd_prev, best_buf = carry
            bnd_in = jax.lax.ppermute(bnd_prev, axis, perm)
            rc = t - k
            active = jnp.logical_and(rc >= 0, rc < c)
            rci = jnp.clip(rc, 0, c - 1)
            win = jax.lax.dynamic_slice(win4, (rci, 0, 0), (1, t4, m))
            lane, bout = _band_call(
                packed_i, win, bnd_in,
                match=match, mismatch=mismatch, gap=gap,
                read_block=read_block, unroll=unroll,
                words_per_chunk=words, ns=ns_local,
                interleaved=interleaved, interpret=interpret,
            )
            scores = lane.reshape(-1)[si_phys]  # (R,) suffix-maxed gather
            best_buf = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    best_buf, scores[None, :], (rci, 0)
                ),
                best_buf,
            )
            bnd_next = jnp.where(active, bout, jnp.zeros_like(bout))
            return bnd_next, best_buf

        init = (
            jnp.zeros((rows, m), jnp.int32),
            jnp.zeros((c, r), jnp.int32),
        )
        _, best = jax.lax.fori_loop(0, rounds, round_body, init)
        return jax.lax.pmax(best, axis)

    fn = shard_map(
        chip_body,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(packed_i, refs_enc, si_phys)


def band_prepack(reads, read_block: int | None = None):
    """One-time read-side prep for the banded ring: packed rows in the
    kernel layout (device-resident), physical gather indices, and the
    resolved (m_pack, read_block).

    Hoisted out of :func:`seqparallel_scores_band` so a totals() call
    with many ref chunks packs/uploads/interleaves the reads ONCE, not
    once per chunk (Python first-fit packing per dispatch is exactly
    the cost the BatchBackend pack cache exists to avoid).
    """
    from sparksmithwaterman_tpu.ops.packing import pack_reads
    from sparksmithwaterman_tpu.ops.pallas_score import (
        _ilv_jit,
        diag_read_block,
        varlen_start_phys,
    )

    m_pack = 128
    longest = max((len(r) for r in reads), default=1)
    while m_pack < longest:
        m_pack *= 2
    packed, start_idx = pack_reads(list(reads), m_pack, row_multiple=8)
    rows = packed.shape[0]
    rb = read_block if read_block is not None else diag_read_block(rows, m_pack)
    while rows % rb:
        rb -= 8
    rb = max(8, rb)
    ilv = m_pack % 128 == 0 and m_pack // 128 > 1
    packed_i = jnp.asarray(packed, jnp.int32)
    si = np.asarray(start_idx)
    if ilv:
        packed_i = _ilv_jit(packed_i)
        si = varlen_start_phys(si, m_pack)
    return dict(
        packed_i=packed_i,
        si=jnp.asarray(si, jnp.int32),
        m_pack=m_pack,
        rb=rb,
        ilv=ilv,
    )


def seqparallel_scores_band(
    reads,
    refs_enc: np.ndarray,
    match: int,
    mismatch: int,
    gap: int,
    *,
    mesh: Mesh,
    axis: str = "seq",
    read_block: int | None = None,
    unroll: int = 64,
    interpret: bool = False,
    prepack: dict | None = None,
):
    """(C, R) per-read max scores via the banded Pallas ring.

    ``reads``: list of read strings (packed internally unless a
    :func:`band_prepack` result is supplied);
    ``refs_enc``: (C, N) uint8 with N % mesh-axis-size == 0.
    ``read_block`` defaults to the calibrated `diag_read_block` (big
    blocks feed the serial diagonal chain its ILP — rb=8 measured ~40x
    below rb=256 at m=128).
    """
    from sparksmithwaterman_tpu.ops.pallas_score import band_chunk_plan

    size = mesh.shape[axis]
    n = refs_enc.shape[1]
    if n % size:
        raise ValueError(f"N={n} must divide over {size} seq shards")
    ns_local = n // size
    pp = prepack if prepack is not None else band_prepack(reads, read_block)
    u, words, t4 = band_chunk_plan(pp["rb"], pp["m_pack"], ns_local, unroll)
    return _seqp_band_call(
        pp["packed_i"],
        jnp.asarray(refs_enc),
        pp["si"],
        match=int(match), mismatch=int(mismatch), gap=int(gap),
        mesh=mesh, axis=axis, read_block=pp["rb"], unroll=u, words=words,
        t4=t4, ns_local=ns_local, interleaved=pp["ilv"],
        interpret=interpret,
    )


def seqparallel_scores(
    reads,
    ref: str,
    match: int,
    mismatch: int,
    gap: int,
    *,
    mesh: Mesh,
    axis: str = "seq",
    stripe: int = 8,
):
    """Max SW score of each read against ONE length-sharded reference.

    Args:
      reads: sequence of read strings (or a pre-encoded (B, M) uint8
        array, 0-padded).
      ref: the reference sequence string (or (N,) uint8, 1-padded).
      mesh: mesh whose ``axis`` dimension shards the reference length.
      stripe: rows per pipeline round (trade pipeline fill latency
        against per-round boundary-exchange overhead).

    Returns:
      (B,) int32 max scores — bitwise equal to the serial oracle.

    Padding is benign by construction: pad codes match nothing and
    mismatch/gap < 0, so padded rows/columns strictly decay (the same
    contract as :func:`..ops.recurrence.score_pairs`).
    """
    size = mesh.shape[axis]
    if isinstance(reads, np.ndarray):
        reads_enc = reads
    else:
        m = max((len(r) for r in reads), default=1)
        m = max(-(-m // stripe) * stripe, stripe)
        reads_enc = encode_batch(list(reads), m, READ_PAD)
    if reads_enc.shape[1] % stripe != 0:
        pad = -(-reads_enc.shape[1] // stripe) * stripe - reads_enc.shape[1]
        reads_enc = np.pad(reads_enc, ((0, 0), (0, pad)), constant_values=READ_PAD)
    if isinstance(ref, np.ndarray):
        ref_enc = ref
    else:
        n = max(-(-len(ref) // size) * size, size)
        ref_enc = encode_batch([ref], n, REF_PAD)[0]
    if ref_enc.shape[0] % size != 0:
        pad = -(-ref_enc.shape[0] // size) * size - ref_enc.shape[0]
        ref_enc = np.pad(ref_enc, (0, pad), constant_values=REF_PAD)

    reads_d = jax.device_put(
        jnp.asarray(reads_enc), NamedSharding(mesh, P(None, None))
    )
    ref_d = jax.device_put(
        jnp.asarray(ref_enc), NamedSharding(mesh, P(axis))
    )
    return _seqp_call(
        reads_d, ref_d, int(match), int(mismatch), int(gap),
        mesh=mesh, axis=axis, stripe=int(stripe),
    )


def seqparallel_scores_batch(
    reads_enc: np.ndarray,
    refs_enc: np.ndarray,
    match: int,
    mismatch: int,
    gap: int,
    *,
    mesh: Mesh,
    axis: str = "seq",
    stripe: int = 8,
):
    """(C, B) max scores: every ref length-sharded, C refs per dispatch.

    ``reads_enc``: (B, M) uint8, M % stripe == 0; ``refs_enc``: (C, N)
    uint8, N % mesh-axis-size == 0.
    """
    return _seqp_call_batch(
        jnp.asarray(reads_enc),
        jnp.asarray(refs_enc),
        int(match), int(mismatch), int(gap),
        mesh=mesh, axis=axis, stripe=int(stripe),
    )


class SeqParallelBackend:
    """Pipeline backend: every reference length-sharded over ALL devices.

    The ``shard_seq`` strategy — the cross-chip form of the reference's
    ``DistributeAlgorithm`` (one DP matrix distributed,
    ``src/sw/Distribution.java:63-214``).  ``totals`` scores each
    reference with its length spread across the mesh; the traceback pass
    (tiny: winning refs only) delegates to the single-host
    :class:`..models.batch_backend.BatchBackend`, whose long-reference
    windowed mode already bounds memory.
    """

    def __init__(self, config, mesh: Mesh | None = None):
        import jax as _jax

        from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

        if mesh is None:
            n = len(_jax.local_devices())  # per-process ICI mesh
            from sparksmithwaterman_tpu.parallel.mesh import build_mesh

            mesh = build_mesh((n,), axis_names=("seq",), n_devices=n)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.stripe = config.seq_stripe
        self._inner = BatchBackend(config)
        self.scoring = config.scoring
        self.read_bucket = config.read_bucket
        self.ref_bucket = config.ref_bucket
        self.gcups = self._inner.gcups
        # TPU: banded Pallas in-band fill + ppermute ring (the lax
        # stripe schedule stays as the CPU/virtual-mesh path).
        self._use_band = self._inner.use_pallas

    def _encode_reads(self, reads):
        m = max((len(r) for r in reads), default=1)
        m = max(-(-m // self.read_bucket) * self.read_bucket, self.stripe)
        m = -(-m // self.stripe) * self.stripe
        return encode_batch(list(reads), m, READ_PAD)

    # Element budget for one dispatch's (C, B, N/size) DP state (int32
    # words, per device); bounds the refs batched into one shard_map
    # call.
    _SEQ_STATE_BUDGET = 1 << 25

    def totals(self, reads, ref_seqs):
        totals = np.zeros(len(ref_seqs), dtype=np.int64)
        if not reads or not ref_seqs:
            return totals
        reads_enc = self._encode_reads(reads)
        b = reads_enc.shape[0]
        size = self.mesh.shape[self.axis]
        quantum = size * self.ref_bucket
        s = self.scoring
        prepack = band_prepack(reads) if self._use_band else None
        # int32-exactness guard (VERDICT r4 weak-6): a per-ref total
        # sums R per-read bests, each bounded by match * m_read; beyond
        # r_safe reads the device int32 sum could silently wrap (fine at
        # 512 reads, wrong at ~10^6 x 150bp).  Reads are reduced in
        # r_safe-sized partials — each exact — and the partials
        # accumulate in int64 on the host, the same discipline as
        # BatchBackend's r_limit + carry-pair reduce.
        m_read = max((len(r) for r in reads), default=1)
        r_safe = max(1, _INT32_SAFE // max(1, s.match * m_read))
        real_cells = sum(len(r) for r in ref_seqs) * sum(len(r) for r in reads)
        with self.gcups.measure_lazy() as done:
            # Group refs by quantized padded length; each group chunk is
            # ONE batched shard_map dispatch (VERDICT r2 task 4: the
            # per-ref dispatch loop dominated this strategy's runtime) —
            # and everything stays PIPELINED: nothing is fetched until
            # every chunk is dispatched.
            # Padded length on the 1.5-mantissa LADDER (quantum * {2^k,
            # 1.5*2^k}), not linear quantum multiples: a corpus-shaped
            # mixed-length ref set (e.g. 8 kb - 1 Mb) would otherwise
            # mint one compiled (ns, t4) band shape per distinct length
            # group — each a remote compile-service round trip — while
            # the ladder bounds shapes at O(log) for <= 1.33x padding
            # (the same trade measured on the batch path; VERDICT r4
            # weak-4).
            groups: dict = {}
            for i, ref in enumerate(ref_seqs):
                n = _quantize_15(max(len(ref), 1), quantum)
                groups.setdefault(n, []).append(i)
            pending = []  # (indices, (C,) device sums)
            for n, idx in sorted(groups.items()):
                c_block = max(
                    1, self._SEQ_STATE_BUDGET // max(1, b * (n // size))
                )
                if self._use_band:
                    # Fusion-safe cap: the band path builds its window
                    # tables inside the shard_map, where the column
                    # stack fuses only up to C=256 (see
                    # engine._c_pad_fusable's measured boundary).
                    c_block = min(c_block, 256)
                for start in range(0, len(idx), c_block):
                    chunk = idx[start : start + c_block]
                    # Quantize the chunk's ref count (2^k ladder) so
                    # ragged tails reuse one compiled shape.  The ladder
                    # starts at 1, NOT 8: long refs dispatch in chunks
                    # of 1-2 (the per-device state budget), and padding
                    # a single 1 Mb ref to 8 would sweep 7 all-pad
                    # bands — 87% waste on exactly the workload this
                    # strategy exists for.
                    c_q = 1
                    while c_q < len(chunk):
                        c_q *= 2
                    refs_enc = encode_batch(
                        [ref_seqs[i] for i in chunk] + [""] * (c_q - len(chunk)),
                        n,
                        REF_PAD,
                    )
                    if self._use_band:
                        # TPU path: banded Pallas kernel inside each
                        # chip's segment, ppermute ring between chips
                        # (VERDICT r3 task 3 — the lax in-band fill
                        # measured 0.62 real GCUPS, ~350x below batch).
                        scores = seqparallel_scores_band(
                            reads, refs_enc, s.match, s.mismatch, s.gap,
                            mesh=self.mesh, axis=self.axis,
                            prepack=prepack,
                        )  # (C_q, R)
                    else:
                        scores = seqparallel_scores_batch(
                            reads_enc, refs_enc, s.match, s.mismatch, s.gap,
                            mesh=self.mesh, axis=self.axis, stripe=self.stripe,
                        )  # (C_q, B)
                    r_tot = scores.shape[1]
                    if r_tot > r_safe:
                        k = -(-r_tot // r_safe)
                        scores = jnp.pad(
                            scores, ((0, 0), (0, k * r_safe - r_tot))
                        ).reshape(scores.shape[0], k, r_safe)
                    else:
                        scores = scores[:, None, :]
                    pending.append(
                        (chunk, scores.sum(axis=2, dtype=jnp.int32))
                    )
            flat = np.asarray(
                jnp.concatenate([col.ravel() for _, col in pending])
            )  # ONE fetch
            off = 0
            for chunk, col in pending:
                part = flat[off : off + col.size].reshape(col.shape)
                off += col.size
                totals[chunk] = (
                    part[: len(chunk)].astype(np.int64).sum(axis=1)
                )
            done(real_cells)
        return totals

    def best_of(self, reads, ref_seqs):
        """(best_total, tie_indices) — host reduce over ``totals``."""
        totals = self.totals(reads, ref_seqs)
        if len(totals) == 0:
            return 0, []
        best = int(totals.max())
        return best, [int(i) for i in np.flatnonzero(totals == best)]

    def sites_for_ref(self, ref_seq, reads):
        return self._inner.sites_for_ref(ref_seq, reads)
