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
    pallas_lane_best_packed_varlen,
    plan_varlen,
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
