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
