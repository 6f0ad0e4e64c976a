"""Sharded-engine tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.recurrence import score_grid
from sparksmithwaterman_tpu.parallel import (
    ShardedBackend,
    build_mesh,
    sharded_score_grid,
    sharded_totals,
)

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def test_virtual_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_sharded_score_grid_matches_local(make_seq, shape):
    mesh = build_mesh(shape)
    reads = [make_seq(int(l)) for l in np.random.default_rng(0).integers(4, 20, 16)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(1).integers(10, 60, 8)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(
        sharded_score_grid(reads_enc, refs_enc, *PARAMS, mesh=mesh)
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_sharded_totals_psum(make_seq):
    mesh = build_mesh((2, 4))
    reads = [make_seq(12) for _ in range(8)]
    refs = [make_seq(40) for _ in range(4)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(sharded_totals(reads_enc, refs_enc, *PARAMS, mesh=mesh))
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS)).sum(axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("strategy", ["shard_refs", "shard_reads"])
def test_sharded_backend_matches_batch(tmp_path, make_seq, strategy, monkeypatch):
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend
    from sparksmithwaterman_tpu.parallel import engine

    config = AlignConfig(
        ref_dir=str(tmp_path),
        in_dir=str(tmp_path),
        out_dir=str(tmp_path),
        strategy=strategy,
        read_bucket=16,
        ref_bucket=32,
    )
    # Spy: the hot path must actually route through the mesh primitive
    # (round 1 regression: ShardedBackend.totals ran single-device).
    calls = {"n": 0}
    real = engine.sharded_totals

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(engine, "sharded_totals", spy)
    # Ragged, non-multiple-of-mesh counts on purpose.
    reads = [make_seq(int(l)) for l in np.random.default_rng(2).integers(1, 15, 11)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(3).integers(5, 30, 5)]
    sharded = ShardedBackend(config)
    batch = BatchBackend(config)
    np.testing.assert_array_equal(
        sharded.totals(reads, refs), batch.totals(reads, refs)
    )
    assert calls["n"] > 0, "ShardedBackend.totals never used the mesh"
    assert sharded.sites_for_ref(refs[0], reads) == batch.sites_for_ref(
        refs[0], reads
    )


def test_sharded_backend_grid_spans_devices(make_seq, tmp_path):
    """The sharded score grid must actually live on >1 device."""
    config = AlignConfig(
        ref_dir=str(tmp_path), in_dir=str(tmp_path), out_dir=str(tmp_path),
        strategy="shard_refs",
    )
    backend = ShardedBackend(config)
    reads_enc = encode_batch([make_seq(12) for _ in range(8)], 16, READ_PAD)
    refs_enc = encode_batch([make_seq(30) for _ in range(8)], 32, REF_PAD)
    dev = backend._score_grid_dev(reads_enc, refs_enc)
    assert len(dev.sharding.device_set) == 8
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(np.asarray(dev)[:8, :8], want)


@pytest.mark.parametrize("shape", [(2, 4), (8, 1)])
def test_sharded_kernel_path_interpret(make_seq, shape):
    """Compile + run the Pallas path under shard_map (interpret mode).

    Round-1 gap: the sharded kernel path compiled nowhere in CI; its
    first hardware run would have been its first execution ever.

    Mesh shapes are (refs, reads); per-shard read rows must divide by
    read_block=8, so 32 reads cover reads-axis sizes 1 and 4.
    """
    mesh = build_mesh(shape)
    rng = np.random.default_rng(4)
    reads = [make_seq(int(l)) for l in rng.integers(4, 16, 32)]
    refs = [make_seq(int(l)) for l in rng.integers(10, 60, 8)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    kp = (5, -3, -4, 8)
    got = np.asarray(
        sharded_score_grid(
            reads_enc, refs_enc, *PARAMS, mesh=mesh, kernel_params=kp,
            interpret=True,
        )
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)
    tot = np.asarray(
        sharded_totals(
            reads_enc, refs_enc, *PARAMS, mesh=mesh, kernel_params=kp,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(tot, want.sum(axis=0))


def test_sharded_kernel_chunked_mode_interpret(make_seq, monkeypatch):
    """Long refs route to the chunked kernel inside shard_map."""
    from sparksmithwaterman_tpu.models import batch_backend

    monkeypatch.setattr(batch_backend, "_CHUNKED_REF_N", 32)
    mesh = build_mesh((2, 4))  # (refs, reads): 32 reads -> 8 rows/shard
    rng = np.random.default_rng(5)
    reads = [make_seq(int(l)) for l in rng.integers(4, 16, 32)]
    refs = [make_seq(int(l)) for l in rng.integers(30, 64, 8)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    kp = (5, -3, -4, 8)
    from sparksmithwaterman_tpu.parallel.engine import _kernel_plan

    assert _kernel_plan(8, 16, 64)["mode"] == "chunked"
    got = np.asarray(
        sharded_score_grid(
            reads_enc, refs_enc, *PARAMS, mesh=mesh, kernel_params=kp,
            interpret=True,
        )
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_sharded_packed_call_interpret(make_seq):
    """The sharded PACKED dispatch (rows sharded over reads, windows
    over refs, per-shard gather + psum) is score-exact vs the lax grid."""
    from sparksmithwaterman_tpu.ops.packing import pack_reads
    from sparksmithwaterman_tpu.parallel.engine import (
        _kernel_plan,
        _sharded_packed_call,
        _sharded_windows,
    )

    mesh = build_mesh((2, 4))  # (refs, reads)
    rng = np.random.default_rng(21)
    reads = [make_seq(int(l)) for l in rng.integers(1, 30, 37)]
    refs = [make_seq(int(l)) for l in rng.integers(20, 90, 8)]
    m_pack = 32
    packed, start_idx = pack_reads(reads, m_pack, row_multiple=8 * 4)
    rows = packed.shape[0]
    rb = 8
    refs_enc = encode_batch(refs, 96, REF_PAD)
    plan = _kernel_plan(rb, m_pack, 96)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    packed_sh = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P("reads", None))
    )
    windows = _sharded_windows(refs_enc, mesh, "refs", m_pack, plan["t_pad"])
    got = np.asarray(
        _sharded_packed_call(
            packed_sh, windows, jnp.asarray(start_idx),
            mesh=mesh, reads_axis="reads", refs_axis="refs",
            kernel_params=(5, -3, -4, rb),
            plan=tuple(sorted(plan.items())),
            interpret=True,
        )
    )
    reads_enc = encode_batch(reads, m_pack, READ_PAD)
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS)).sum(axis=0)
    np.testing.assert_array_equal(got, want)


def test_sharded_backend_packed_routes_to_mesh(make_seq, monkeypatch, tmp_path):
    """With packing forced on, ShardedBackend must dispatch through the
    mesh-sharded varlen call (NOT the single-device packed path)."""
    from sparksmithwaterman_tpu.parallel import engine

    calls = {"n": 0}
    real = engine._sharded_varlen_call

    def spy(*a, **k):
        calls["n"] += 1
        k["interpret"] = True
        return real(*a, **k)

    monkeypatch.setattr(engine, "_sharded_varlen_call", spy)
    config = AlignConfig(
        ref_dir=str(tmp_path), in_dir=str(tmp_path), out_dir=str(tmp_path),
        strategy="shard_refs", read_bucket=16, ref_bucket=32,
    )
    be = engine.ShardedBackend(config)
    be.use_pallas = True  # force the packed diag branch off-TPU
    rng = np.random.default_rng(22)
    reads = [make_seq(int(l)) for l in rng.integers(1, 20, 13)]
    refs = [make_seq(int(l)) for l in rng.integers(10, 50, 5)]
    got = be.totals(reads, refs)
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    want = BatchBackend(config).totals(reads, refs)
    np.testing.assert_array_equal(got, want)
    assert calls["n"] > 0


def test_vmem_retry_fallback():
    """A Mosaic scoped-VMEM RESOURCE_EXHAUSTED at dispatch degrades to a
    smaller unroll (cached per shape) instead of crashing; other errors
    propagate.  VERDICT r2 task 5 (forced misprediction)."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    be = BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir="."))
    calls = []

    def flaky(unroll):
        calls.append(unroll)
        if unroll > 8:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Attempting to allocate 17.89M in "
                "scoped vmem. Its current capacity is 16.00M"
            )
        return unroll

    assert be._vmem_retry(("k", 1), flaky) == 8
    assert calls == [64, 32, 16, 8]
    # Cached: the next call starts at the corrected unroll.
    calls.clear()
    assert be._vmem_retry(("k", 1), flaky) == 8
    assert calls == [8]

    # Non-VMEM errors are not swallowed.
    import pytest

    def broken(unroll):
        raise ValueError("something unrelated")

    with pytest.raises(ValueError, match="unrelated"):
        be._vmem_retry(("k2", 1), broken)

    # An OOM that never clears bottoms out at unroll=2 and re-raises.
    def always(unroll):
        raise RuntimeError("RESOURCE_EXHAUSTED in scoped vmem")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        be._vmem_retry(("k3", 1), always)


def test_vmem_limit_env_override(monkeypatch):
    from sparksmithwaterman_tpu.ops.pallas_score import _vmem_limit

    monkeypatch.setenv("SWTPU_VMEM_LIMIT", "8000000")
    assert _vmem_limit() == 8.0e6
    monkeypatch.delenv("SWTPU_VMEM_LIMIT")
    assert _vmem_limit() >= 16.0e6
