"""Backend failure-handling hardening (VERDICT r3 task 8 + advisor
findings): the unroll-halving retry must fire ONLY for Mosaic
scoped-VMEM exhaustion, and the pack cache must notice an in-place
mutated reads list."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend


def _backend():
    return BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir="."))


SCOPED_VMEM_MSG = (
    "RESOURCE_EXHAUSTED: XLA:TPU compile permanent error. "
    "Ran out of memory in memory space vmem. Used 17.89M of 16.00M."
)
HBM_OOM_MSG = (
    "RESOURCE_EXHAUSTED: Error allocating device buffer: Attempting "
    "to allocate 4.00G. That was not possible. There are 1.23G free."
)


def test_is_vmem_oom_matches_scoped_vmem_only():
    be = _backend()
    assert be._is_vmem_oom(RuntimeError(SCOPED_VMEM_MSG))
    # HBM OOM is RESOURCE_EXHAUSTED too, but a smaller unroll cannot
    # help — it must propagate immediately.
    assert not be._is_vmem_oom(RuntimeError(HBM_OOM_MSG))
    assert not be._is_vmem_oom(ValueError("unrelated"))


def test_vmem_retry_propagates_hbm_oom_without_retry():
    be = _backend()
    calls = []

    def fn(unroll):
        calls.append(unroll)
        raise RuntimeError(HBM_OOM_MSG)

    with pytest.raises(RuntimeError, match="allocating device buffer"):
        be._vmem_retry(("k", 1), fn)
    assert calls == [64]  # exactly one attempt, no halving ladder


def test_vmem_retry_halves_on_scoped_vmem():
    be = _backend()
    calls = []

    def fn(unroll):
        calls.append(unroll)
        if unroll > 16:
            raise RuntimeError(SCOPED_VMEM_MSG)
        return "ok"

    assert be._vmem_retry(("k2", 1), fn) == "ok"
    assert calls == [64, 32, 16]
    # correction cached for the session
    assert be._vmem_retry(("k2", 1), fn) == "ok"
    assert calls[-1] == 16


def test_c_pad_fusable_shapes():
    """Sharded ref-count padding must land on shapes whose window-build
    column stack FUSES (measured on v5e: above 256 only multiples of
    128 compile; 448..576 non-multiples requested 65 GB of padded
    temps) while staying a multiple of the 8*dc shard quantum."""
    from sparksmithwaterman_tpu.parallel.engine import _c_pad_fusable

    for c in (1, 7, 100, 130, 256, 481, 630, 910, 2730):
        for dc in (1, 2, 4, 8):
            p = _c_pad_fusable(c, dc)
            assert p >= c and p % (8 * dc) == 0, (c, dc, p)
            if p > 256:
                assert p % 128 == 0, (c, dc, p)
    assert _c_pad_fusable(481, 1) == 512
    assert _c_pad_fusable(100, 1) == 128


def test_varlen_tail_chunks_use_canonical_shape(monkeypatch):
    """At corpus scale every tier's tail chunk must reuse the tier's
    full-chunk compile shape (c_target padding) — per-flush unique tail
    shapes cost a compile-service round trip each (round-4 corpus
    finding).  Small total ref sets keep their own ladder shape."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb

    be = bb.BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir="."))
    be.use_pallas = True  # force the varlen dispatch branch off-TPU
    seen = []

    def fake_varlen(pack, refs_enc, lens, c_target=0):
        c_pad = bb._quantize_15(max(refs_enc.shape[0], c_target, 8), 8)
        seen.append((refs_enc.shape[0], c_target, c_pad))
        return np.zeros(refs_enc.shape[0], np.int64)

    monkeypatch.setattr(be, "_packed_col_sums_varlen", fake_varlen)
    # Shrink the table budget so 40 equal-length refs split into full
    # chunks + a tail.
    monkeypatch.setattr(bb, "_TABLE_BUDGET", 1 << 18)
    rng = np.random.default_rng(3)
    bases = np.array(list("ACGT"))
    reads = ["".join(rng.choice(bases, size=30))]
    refs = ["".join(rng.choice(bases, size=200)) for _ in range(43)]
    be.totals(reads, refs)
    assert len(seen) > 1, "workload must split into several chunks"
    full_pad = seen[0][2]
    # A short tail chunk exists and still resolves to the full shape.
    assert any(c < full_pad for c, _, _ in seen), seen
    assert all(pad == full_pad for _, _, pad in seen), seen


def test_single_block_pack_never_doubles():
    """Lane-fill regression: a read set whose bp sits just past the
    est_rows == rb_t edge must NOT round its rows up to 2x (the round-4
    1 Gbp corpus paid 2.0x padded kernel work per flush from this).
    The lcm rounding may only engage for multi-block packs."""
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    for target_bp in (59_100, 59_534, 60_000, 61_000):
        be = _backend()
        reads = []
        bp = 0
        while bp < target_bp:
            l = int(rng.integers(80, 151))
            reads.append("".join(rng.choice(bases, size=l)))
            bp += l
        pack = be._pack_chunks(reads, 10**9)[0]
        waste = pack["rows"] * pack["m_pack"] / bp
        assert waste < 1.35, (target_bp, pack["rows"], waste)


def test_double_buffered_flushes_semantics():
    """The shared winner-merge helper: resolves in dispatch order with
    at most one flush in flight, `>` replaces / `==` appends in
    encounter order, and falls back to sync best_of when the backend
    has no async form."""
    from sparksmithwaterman_tpu.models.pipeline import DoubleBufferedFlushes

    events = []

    class AsyncBackend:
        def __init__(self):
            self.results = iter([(5, [0]), (7, [1]), (7, [0, 2]), (3, [0])])

        def best_of_async(self, reads, seqs):
            events.append(("dispatch", tuple(seqs)))
            res = next(self.results)

            def resolve():
                events.append(("resolve", tuple(seqs)))
                return res

            return resolve

    m = DoubleBufferedFlushes(AsyncBackend(), ["r"])
    m.dispatch(["a", "b"], ["A", "B"])          # best 5, winner b->? ties [0] => a
    assert events == [("dispatch", ("A", "B"))]  # nothing resolved yet
    m.dispatch(["c", "d"], ["C", "D"])          # 7 ties [1] -> d replaces
    m.dispatch(["e", "f", "g"], ["E", "F", "G"])  # 7 ties [0,2] -> e,g append
    m.dispatch(["h"], ["H"])                     # 3 -> ignored
    m.finish()
    assert m.best == 7 and m.winners == ["d", "e", "g"]
    # resolution strictly followed dispatch of the NEXT flush
    kinds = [k for k, _ in events]
    assert kinds == [
        "dispatch", "dispatch", "resolve", "dispatch", "resolve",
        "dispatch", "resolve", "resolve",
    ]

    class SyncBackend:
        def best_of(self, reads, seqs):
            return (1, [0])

    s = DoubleBufferedFlushes(SyncBackend(), ["r"])
    s.dispatch(["x"], ["X"])
    s.finish()
    assert s.best == 1 and s.winners == ["x"]
    # empty dispatches are no-ops
    s.dispatch([], [])
    s.finish()
    assert s.winners == ["x"]


def test_pack_cache_len_tripwire():
    """Same list object, mutated in place: the identity check alone
    would silently reuse stale packed rows; the len tripwire repacks."""
    be = _backend()
    reads = ["ACGTACGT", "TTGGAACC"]
    packs1 = be._pack_chunks(reads, 1 << 20)
    assert be._pack_chunks(reads, 1 << 20) is packs1  # memo hit
    reads.append("GGGGCCCC")
    packs2 = be._pack_chunks(reads, 1 << 20)
    assert packs2 is not packs1
    assert sum(len(p["read_idx"]) for p in packs2) == 3
