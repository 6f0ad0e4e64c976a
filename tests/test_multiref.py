"""Multi-ref FOLDED chunked kernel (`pallas_lane_best_packed_multi`).

Round-5 long-reference fix: few-reads x long-refs dispatches fold CF
references' row blocks into one program's DP state so their wavefronts
share a single serial diagonal chain (the chunked kernels were
latency-bound below ~256 rows — 54.5 shipped GCUPS vs 251 committed at
the 131 kb bench shape).  Interpret-mode parity on CPU at tiny shapes;
compiled-mode coverage comes from `bench.py run_smoke` ("packed_multi")
on hardware.
"""

import numpy as np
import pytest

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import (
    pack_reads,
    packed_col_sums,
    read_best,
)
from sparksmithwaterman_tpu.ops.pallas_score import (
    pallas_lane_best_packed_multi,
    plan_multi,
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


def test_plan_multi_fits_and_divides():
    u, c4 = plan_multi(32, 256, 8)
    assert u % 4 == 0 and (4 * c4) % u == 0
    # a giant fold that cannot fit returns None
    assert plan_multi(512, 1024, 64) is None


@pytest.mark.parametrize("cf", [1, 2, 3])
def test_multi_fold_parity_m128(cf):
    """Plain layout (m=128, h=1): cf folded refs match the recurrence."""
    rng = np.random.default_rng(11)
    reads = _rand_seqs(rng, rng.integers(20, 100, size=10))
    n = 160
    refs = _rand_seqs(rng, [n - 7, n, n - 30] * cf)[: 3 * cf]
    packed, si = pack_reads(reads, 128, row_multiple=8)
    lane = pallas_lane_best_packed_multi(
        packed,
        encode_batch(refs, n, REF_PAD),
        *(int(p) for p in PARAMS),
        read_block=8,
        cf=cf,
        unroll=8,
        chunk4=16,  # force several chunks: diags=287 -> 5 chunks of 64
        interpret=True,
    )
    got = np.asarray(read_best(lane, si))
    want = _want(reads, refs, 128, n)
    assert np.array_equal(got, want)


def test_multi_fold_parity_interleaved_m256():
    """Interleaved layout (m=256, h=2) with physical-index gather."""
    rng = np.random.default_rng(13)
    reads = _rand_seqs(rng, rng.integers(60, 200, size=9))
    refs = _rand_seqs(rng, [300, 222, 304, 280])
    packed, si = pack_reads(reads, 256, row_multiple=8)
    lane = pallas_lane_best_packed_multi(
        packed,
        encode_batch(refs, 304, REF_PAD),
        *(int(p) for p in PARAMS),
        read_block=8,
        cf=2,
        unroll=8,
        chunk4=32,
        interpret=True,
        deinterleave=False,
    )
    got = np.asarray(read_best(lane, varlen_start_phys(si, 256)))
    want = _want(reads, refs, 256, 304)
    assert np.array_equal(got, want)
    # col sums through the same physical gather (the backend's epilogue)
    sums = np.asarray(packed_col_sums(lane, varlen_start_phys(si, 256)))
    assert np.array_equal(sums[: len(refs)], want.sum(axis=0))


def test_multi_fold_pad_refs_score_zero():
    """All-REF_PAD pad rows (C padded to a cf multiple) score 0."""
    rng = np.random.default_rng(17)
    reads = _rand_seqs(rng, [30, 44, 25])
    refs = _rand_seqs(rng, [90, 77, 0])  # 3rd ref is the pad row
    packed, si = pack_reads(reads, 64, row_multiple=8)
    lane = pallas_lane_best_packed_multi(
        packed,
        encode_batch(refs, 96, REF_PAD),
        *(int(p) for p in PARAMS),
        read_block=8,
        cf=3,
        unroll=4,
        chunk4=8,
        interpret=True,
    )
    got = np.asarray(read_best(lane, si))
    want = _want(reads, refs, 64, 96)
    assert np.array_equal(got, want)
    assert (got[:, 2] == 0).all()


def test_backend_longref_fallback_takes_multi_fold(monkeypatch):
    """When the varlen plan cannot fit (long refs), the backend's
    fallback folds refs into the row dimension — totals must stay exact
    and the fold must actually be the path taken."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb
    from sparksmithwaterman_tpu.ops import pallas_score as ps

    calls = []
    real_multi = ps.pallas_lane_best_packed_multi

    def fake_multi(*a, **k):
        k["interpret"] = True
        k["unroll"] = min(k.get("unroll", 8), 8)
        calls.append(k["cf"])
        return real_multi(*a, **k)

    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score.plan_varlen",
        lambda *a, **k: None,
    )
    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score."
        "pallas_lane_best_packed_multi",
        fake_multi,
    )
    rng = np.random.default_rng(23)
    reads = _rand_seqs(rng, rng.integers(20, 90, size=12))
    refs = _rand_seqs(rng, [150, 90, 130, 155, 101])
    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", read_bucket=32, ref_bucket=64
    )
    want = bb.BatchBackend(cfg).totals(reads, refs)  # lax path
    be = bb.BatchBackend(cfg)
    be.use_pallas = True
    got = be.totals(reads, refs)
    np.testing.assert_array_equal(got, want)
    assert calls and all(cf > 1 for cf in calls)


def test_multi_rejects_bad_fold():
    rng = np.random.default_rng(19)
    reads = _rand_seqs(rng, [30])
    refs = _rand_seqs(rng, [50, 50, 50])
    packed, _ = pack_reads(reads, 64, row_multiple=8)
    with pytest.raises(ValueError, match="multiple of cf"):
        pallas_lane_best_packed_multi(
            packed,
            encode_batch(refs, 64, REF_PAD),
            *(int(p) for p in PARAMS),
            read_block=8,
            cf=2,
            interpret=True,
        )


def test_out_budget_caps_ref_chunks(monkeypatch):
    """The per-dispatch (C, ROWS, M) output cap must split ref chunks
    without changing totals (the 100k-read 25 GB HBM OOM class)."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb
    from sparksmithwaterman_tpu.ops import pallas_score as ps

    rng = np.random.default_rng(29)
    reads = _rand_seqs(rng, rng.integers(20, 90, size=10))
    refs = _rand_seqs(rng, rng.integers(60, 200, size=12))
    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", read_bucket=32, ref_bucket=64
    )
    want = bb.BatchBackend(cfg).totals(reads, refs)

    real_varlen = ps.pallas_lane_best_packed_varlen
    shapes = []

    def fake_varlen(packed, refs_enc, *a, **k):
        k["interpret"] = True
        k["unroll"] = min(k.get("unroll", 8), 8)
        shapes.append(refs_enc.shape[0])
        return real_varlen(packed, refs_enc, *a, **k)

    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score."
        "pallas_lane_best_packed_varlen",
        fake_varlen,
    )
    # Force the output cap to ~2 refs per dispatch.
    rows_m = 8 * 128  # one pack row block at m_pack=128
    monkeypatch.setattr(bb, "_OUT_BUDGET", 2 * rows_m)
    be = bb.BatchBackend(cfg)
    be.use_pallas = True
    got = be.totals(reads, refs)
    np.testing.assert_array_equal(got, want)
    assert len(shapes) >= 3 and max(shapes) <= 8  # ladder-padded chunks


def test_sharded_one_device_mesh_takes_fold(monkeypatch):
    """ShardedBackend's varlen fallback on a 1-device mesh delegates to
    the single-device fold path (nothing to shard; the mesh grouped
    form lacks the fold + byte-packed window)."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb
    from sparksmithwaterman_tpu.ops import pallas_score as ps
    from sparksmithwaterman_tpu.parallel.engine import ShardedBackend
    from sparksmithwaterman_tpu.parallel.mesh import build_mesh

    calls = []
    real_multi = ps.pallas_lane_best_packed_multi

    def fake_multi(*a, **k):
        k["interpret"] = True
        k["unroll"] = min(k.get("unroll", 8), 8)
        calls.append(k["cf"])
        return real_multi(*a, **k)

    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score.plan_varlen",
        lambda *a, **k: None,
    )
    monkeypatch.setattr(
        "sparksmithwaterman_tpu.ops.pallas_score."
        "pallas_lane_best_packed_multi",
        fake_multi,
    )
    rng = np.random.default_rng(31)
    reads = _rand_seqs(rng, rng.integers(20, 90, size=9))
    refs = _rand_seqs(rng, [150, 90, 130, 101])
    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", strategy="shard_refs",
        read_bucket=32, ref_bucket=64,
    )
    want = bb.BatchBackend(cfg).totals(reads, refs)
    be = ShardedBackend(cfg, mesh=build_mesh((1, 1), n_devices=1))
    be.use_pallas = True
    got = be.totals(reads, refs)
    np.testing.assert_array_equal(got, want)
    assert calls and all(cf >= 1 for cf in calls)


@pytest.mark.parametrize(
    "m,t4,ilv",
    [
        (128, 72, False),
        (128, 72, True),
        (256, 104, True),
        (384, 200, True),   # h=3: shear invalid -> column build
        (512, 240, True),   # h=4
        (1024, 400, True),  # h=8 (strided-sa tiles)
    ],
)
def test_shear_window_build_matches_column(m, t4, ilv):
    """`_diag_windows_packed4_shear` must be bit-identical to the column
    build at every packed lane tier, both layouts (the shear assembles
    the interleaved order from (shear-row, phase) regrouping)."""
    import jax.numpy as jnp

    from sparksmithwaterman_tpu.ops.pallas_score import (
        _diag_windows_packed4,
        _windows_packed4_best,
    )

    rng = np.random.default_rng(m + t4)
    nmax = 4 * t4 - m + 1
    for n in (min(m - 7, nmax), nmax, max(1, nmax - 13)):
        refs = rng.integers(65, 85, size=(3, n)).astype(np.int32)
        old = np.asarray(
            _diag_windows_packed4(jnp.asarray(refs), m, t4, ilv=ilv)
        )
        new = np.asarray(
            _windows_packed4_best(jnp.asarray(refs), m, t4, ilv=ilv)
        )
        np.testing.assert_array_equal(old, new)
