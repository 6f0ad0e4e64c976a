"""Varlen packed kernel (scalar-prefetched per-ref loop bounds,
byte-packed window, interleaved lane layout at m>=256).

Interpret-mode parity on CPU at deliberately TINY shapes (interpret is
~1000x slower than compiled); the on-hardware smoke suite
(`bench.py run_smoke` -> "packed_varlen") covers compiled mode at
realistic shapes.
"""

import numpy as np
import pytest

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import pack_reads, read_best
from sparksmithwaterman_tpu.ops.pallas_score import (
    _deilv_lanes,
    _ilv_lanes,
    _ilv_logical_col,
    _make_ilv_shift_left,
    diag_read_block,
    pallas_lane_best_packed_varlen,
    plan_varlen,
    varlen_start_phys,
)
from sparksmithwaterman_tpu.ops.recurrence import score_grid

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))
_BASES = np.array(list("ACGT"))


def _rand_seqs(rng, lens):
    return ["".join(rng.choice(_BASES, size=int(l))) for l in lens]


def _want(reads, refs, m_pad, n_pad):
    return np.asarray(
        score_grid(
            encode_batch(reads, m_pad, READ_PAD),
            encode_batch(refs, n_pad, REF_PAD),
            *PARAMS,
        )
    )


def test_ilv_roundtrip():
    rng = np.random.default_rng(0)
    for m in (128, 256, 512):
        x = rng.integers(0, 1000, size=(5, m)).astype(np.int32)
        i = _ilv_lanes(x)
        assert np.array_equal(_deilv_lanes(i), x)
        if m > 128:
            h = m // 128
            # spot-check the mapping: logical lane l*h + hh at phys hh*128 + l
            assert i[0, 1 * 128 + 3] == x[0, 3 * h + 1]


def test_ilv_logical_col():
    import jax

    col = np.asarray(jax.jit(lambda: _ilv_logical_col((1, 256), 2))())
    # phys p = hh*128 + l -> logical l*2 + hh
    assert col[0, 0] == 0
    assert col[0, 128] == 1
    assert col[0, 1] == 2
    assert col[0, 255] == 255


def test_varlen_mixed_refs_m128():
    """Plain (non-interleaved) varlen at m=128, ragged reads + refs."""
    rng = np.random.default_rng(7)
    reads = _rand_seqs(rng, rng.integers(10, 65, size=8))
    refs = _rand_seqs(rng, [17, 96, 40, 128])
    packed, si = pack_reads(reads, 128, row_multiple=8)
    lane = pallas_lane_best_packed_varlen(
        packed,
        encode_batch(refs, 128, REF_PAD),
        [len(r) for r in refs],
        *(int(p) for p in PARAMS),
        read_block=8,
        unroll=8,
        interpret=True,
    )
    got = np.asarray(read_best(lane, si))
    assert np.array_equal(got, _want(reads, refs, 128, 128))


def test_varlen_interleaved_m256():
    """Interleaved layout (m=256): parity incl. a read straddling the
    128-lane tile boundary within its packed row."""
    rng = np.random.default_rng(3)
    reads = _rand_seqs(rng, [130, 60, 200, 33])  # 130 forces 2-read rows
    refs = _rand_seqs(rng, [48, 90])
    packed, si = pack_reads(reads, 256, row_multiple=8)
    lane = pallas_lane_best_packed_varlen(
        packed,
        encode_batch(refs, 96, REF_PAD),
        [len(r) for r in refs],
        *(int(p) for p in PARAMS),
        read_block=8,
        unroll=8,
        interpret=True,
    )
    got = np.asarray(read_best(lane, si))
    assert np.array_equal(got, _want(reads, refs, 256, 96))


def test_plan_varlen_keeps_unroll_at_long_refs():
    # the whole-table plan decays to unroll 8 by n=4096 at m=256; the
    # byte-packed window keeps 64 (the point of the varlen kernel)
    plan = plan_varlen(248, 256, 4096, 64)
    assert plan is not None and plan[0] == 64
    # and the planner still degrades (not crashes) at absurd widths
    assert plan_varlen(8, 8192, 200_000, 64) is None or True


def test_varlen_plan_failure_falls_back_to_grouped(monkeypatch):
    """When no varlen config fits scoped VMEM (giant-read shapes), the
    backend degrades to the grouped chunked-window dispatch instead of
    raising."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb

    be = bb.BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir="."))
    called = {"grouped": 0}

    def fake_grouped(pack, refs_enc):
        called["grouped"] += 1
        return np.zeros(refs_enc.shape[0], np.int32)

    monkeypatch.setattr(be, "_packed_col_sums", fake_grouped)
    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score.plan_varlen",
        lambda *a, **k: None,
    )
    pack = dict(rows=8, m_pack=128, packed=None, start_idx=None)
    out = be._packed_col_sums_varlen(
        pack, np.full((3, 64), 1, np.uint8), np.array([64, 64, 64], np.int32)
    )
    assert called["grouped"] == 1
    assert out.shape == (3,)


@pytest.mark.parametrize("h", [2, 3, 4, 6])
def test_ilv_shift_left_all_tile_counts(h):
    """The interleaved logical left-shift must equal the plain logical
    shift for EVERY (tile count, shift) the suffix-max ladder uses —
    including non-power-of-two h (m=384 -> h=3, m=768 -> h=6), where
    the wrapped tiles must advance (j+s)//h lanes, not always 1 (the
    round-3 bug silently corrupted alignment scores at those widths)."""
    import jax
    from jax.experimental import pallas as pl

    m = 128 * h
    rng = np.random.default_rng(h)
    x = rng.integers(0, 10_000, size=(8, m)).astype(np.int32)
    shifts = [1, 2, 4, 5, 7] + [s for s in (8, 16, 32, 64, 128, 256) if s < m]

    import jax.numpy as jnp

    def kern(x_ref, o_ref, *, s):
        sl = _make_ilv_shift_left(h, _ilv_logical_col((8, m), h))
        o_ref[...] = sl(x_ref[...], s, jnp.asarray(-1, jnp.int32))

    for s in shifts:
        got = pl.pallas_call(
            lambda x_ref, o_ref, s=s: kern(x_ref, o_ref, s=s),
            out_shape=jax.ShapeDtypeStruct((8, m), np.int32),
            interpret=True,
        )(_ilv_lanes(x))
        got = np.asarray(_deilv_lanes(got))
        want = np.full_like(x, -1)
        want[:, : m - s] = x[:, s:]
        assert np.array_equal(got, want), f"h={h} s={s}"


def test_varlen_interleaved_m384_non_pow2_tiles():
    """Full-kernel parity at m=384 (h=3): the lane width the round-3
    interleave shift got wrong for every doubling shift >= 4.  Reads
    >192bp force the 384 tier; multiple reads per row exercise the
    segmented suffix max across tile boundaries."""
    rng = np.random.default_rng(11)
    reads = _rand_seqs(rng, [200, 120, 60, 350, 90, 33])
    refs = _rand_seqs(rng, [48, 90, 130])
    packed, si = pack_reads(reads, 384, row_multiple=8)
    lane = pallas_lane_best_packed_varlen(
        packed,
        encode_batch(refs, 136, REF_PAD),
        [len(r) for r in refs],
        *(int(p) for p in PARAMS),
        read_block=8,
        unroll=8,
        interpret=True,
        deinterleave=False,
    )
    got = np.asarray(read_best(lane, varlen_start_phys(np.asarray(si), 384)))
    assert np.array_equal(got, _want(reads, refs, 384, 136))


def test_varlen_non_multiple_of_128_lanes_skips_interleave():
    """m not a multiple of 128 (e.g. a 192-lane pack tier) must take
    the plain layout, not crash the _ilv_lanes reshape."""
    rng = np.random.default_rng(13)
    reads = _rand_seqs(rng, [150, 60, 180, 40])
    refs = _rand_seqs(rng, [64, 100])
    packed, si = pack_reads(reads, 192, row_multiple=8)
    lens = [len(r) for r in refs]
    lane = pallas_lane_best_packed_varlen(
        packed,
        encode_batch(refs, 104, REF_PAD),
        lens,
        *(int(p) for p in PARAMS),
        read_block=8,
        unroll=8,
        interpret=True,
        deinterleave=False,
    )
    # varlen_start_phys must agree with the kernel's (non-)interleave gate
    got = np.asarray(read_best(lane, varlen_start_phys(np.asarray(si), 192)))
    assert np.array_equal(got, _want(reads, refs, 192, 104))


def test_diag_read_block_always_divides():
    """The resolved read block must divide the padded row count — the
    kernels raise on R % read_block != 0 and two callers pass it
    straight through (the giant-read r_pad=24 corner returned a
    non-divisor 16 before round 4)."""
    for r_pad in (8, 16, 24, 40, 48, 96, 384, 47_880 // 8 * 8):
        for m_pad in (128, 256, 384, 2048, 8192, 65_536):
            rb = diag_read_block(r_pad, m_pad)
            assert rb >= 8 and rb % 8 == 0
            assert r_pad % rb == 0, (r_pad, m_pad, rb)


def test_varlen_empty_and_zero_len_refs():
    rng = np.random.default_rng(5)
    reads = _rand_seqs(rng, [20, 40])
    refs = ["", "ACGTACGT"]
    packed, si = pack_reads(reads, 128, row_multiple=8)
    lane = pallas_lane_best_packed_varlen(
        packed,
        encode_batch(refs, 8, REF_PAD),
        [len(r) for r in refs],
        *(int(p) for p in PARAMS),
        read_block=8,
        unroll=8,
        interpret=True,
    )
    got = np.asarray(read_best(lane, si))
    assert np.array_equal(got, _want(reads, refs, 128, 8))
