"""Long-reference windowed-traceback parity tests."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.ops.longseq import (
    find_max_cells,
    sites_for_pair_long,
    window_width,
)

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def _embed(rng, ref_len, read, positions):
    """Random ref with (mutated) copies of `read` planted at positions."""
    ref = list("".join(rng.choice(list("ACGT"), size=ref_len)))
    for p in positions:
        ref[p : p + len(read)] = read
    return "".join(ref)


@pytest.mark.parametrize("seed", range(4))
def test_max_cells_match_oracle_matrix(make_seq, seed):
    rng = np.random.default_rng(seed)
    read = make_seq(int(rng.integers(3, 20)))
    ref = make_seq(int(rng.integers(10, 120)))
    best, cells = find_max_cells(read, ref, PARAMS)
    h, _, max_score, _ = oracle.fill_matrices(ref, read)
    h = h[1:, 1:]  # oracle keeps the boundary row/col
    assert best == max_score == h.max()
    want = np.argwhere(h == h.max())
    np.testing.assert_array_equal(cells, want)


@pytest.mark.parametrize("seed", range(4))
def test_long_sites_match_oracle(make_seq, seed):
    rng = np.random.default_rng(100 + seed)
    read = make_seq(12)
    ref = _embed(rng, 600, read, [50, 400])
    got = sites_for_pair_long(ref, read, PARAMS)
    _, want = oracle.opt_alignments(ref, read)
    assert got == want


def test_long_sites_with_gapped_alignment(make_seq):
    rng = np.random.default_rng(7)
    read = "ACGTACGTTTACGT"
    mutated = "ACGTACGTTACGT"  # one deletion
    ref = _embed(rng, 2000, mutated, [777])
    got = sites_for_pair_long(ref, read, PARAMS)
    _, want = oracle.opt_alignments(ref, read)
    assert got == want


def test_window_width_bound():
    assert window_width(12, 10_000) == 34
    assert window_width(500, 200) == 200  # clamped to ref length


def test_backend_long_path_matches_serial(make_seq):
    # Force the long path with a ref big enough to trip the fill budget
    # (budget is 1<<24 int32 words; 300 reads-bucket x 70k ref > budget).
    from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(11)
    read = make_seq(24)
    ref = _embed(rng, 70_000, read, [1000, 35_000, 69_970])
    config = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", read_bucket=256, ref_bucket=256
    )
    backend = BatchBackend(config)
    got = backend.sites_for_ref(ref, [read, read[:10]])
    _, s1 = oracle.opt_alignments(ref, read)
    _, s2 = oracle.opt_alignments(ref, read[:10])
    want = sorted(s1 + s2, key=lambda s: s[0])
    assert got == want


def test_backend_long_path_batched_mixed_reads(make_seq):
    """The round-4 batched long-ref traceback (all reads' windows in
    one dispatch set): mixed read lengths, several sites each, plus a
    degenerate all-mismatch read — oracle-exact per read."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(29)
    r1, r2 = make_seq(30), make_seq(14)
    base = _embed(rng, 70_000, r1, [500, 40_000])
    ref = base[:20_000] + r2 + base[20_000 + len(r2) :]
    reads = [r1, r2, make_seq(9), "A" * 12]
    backend = BatchBackend(
        AlignConfig(ref_dir=".", in_dir=".", out_dir=".",
                    read_bucket=256, ref_bucket=256)
    )
    got = backend.sites_for_ref(ref, reads)
    want = []
    for read in reads:
        want.extend(oracle.opt_alignments(ref, read)[1])
    want.sort(key=lambda s: s[0])
    assert got == want


@pytest.mark.parametrize("backend", ["scan", "pallas"])
def test_find_max_cells_batched_parity(make_seq, backend):
    from sparksmithwaterman_tpu.ops.longseq import find_max_cells_batched

    rng = np.random.default_rng(21)
    reads = [make_seq(int(l)) for l in rng.integers(4, 20, 5)]
    ref = _embed(rng, 500, reads[0], [100, 350])
    got = find_max_cells_batched(
        reads, ref, PARAMS, backend=backend,
        **({"interpret": True} if backend == "pallas" else {}),
    )
    for (gb, gc), read in zip(got, reads):
        wb, wc = find_max_cells(read, ref, PARAMS)
        assert gb == wb
        np.testing.assert_array_equal(gc, wc)


def test_sites_for_pair_long_precomputed_cells(make_seq):
    rng = np.random.default_rng(22)
    read = make_seq(12)
    ref = _embed(rng, 600, read, [50, 400])
    pre = find_max_cells(read, ref, PARAMS)
    got = sites_for_pair_long(ref, read, PARAMS, max_cells=pre)
    _, want = oracle.opt_alignments(ref, read)
    assert got == want


def test_degenerate_all_zero_long_ref_is_capped():
    """A 131kb ref x 128bp all-mismatch read must not materialize m*n
    (16.7M) empty sites (VERDICT r1 weak #6): the identical
    (0, ('', '')) sites are capped at DEGENERATE_SITE_CAP.  Below the
    cap the count is exact oracle parity."""
    from sparksmithwaterman_tpu.ops.longseq import sites_for_pair_long
    from sparksmithwaterman_tpu.ops.traceback import (
        DEGENERATE_SITE_CAP,
        degenerate_sites,
    )

    ref = "CGT" * 43700  # 131,100 bp, no 'A'
    read = "A" * 128
    sites = sites_for_pair_long(ref, read, (5, -3, -4))
    # CAP empty sites + one self-describing truncation note (r4: a
    # capped report must not be indistinguishable from an uncapped one).
    assert len(sites) == DEGENERATE_SITE_CAP + 1
    assert sites[0] == (0, ("", ""))
    omitted = 128 * 131_100 - DEGENERATE_SITE_CAP
    assert sites[-1][1][0] == (
        f"[{omitted} identical zero-score sites omitted]"
    )
    # The note renders as ONE bracketed line, not an Index/ref/read block.
    from sparksmithwaterman_tpu.io.report import build_report

    report = build_report([read], 1, 1, 0, 0, [(("m", "s"), sites[-1:])])
    assert "\t[%d identical zero-score sites omitted]\n" % omitted in report
    assert "Index =" not in report.split("Maximum alignment score")[1]
    # Small matrices stay exact (m * n below the cap, no note).
    assert len(degenerate_sites(4, 9)) == 36
