"""Tests for the metrics package (generator, stats, median, sweeps)."""

import json
import os
import statistics

import numpy as np
import pytest

from sparksmithwaterman_tpu.io import get_reads, get_ref_seqs
from sparksmithwaterman_tpu.metrics import engineer_data
from sparksmithwaterman_tpu.metrics.execution_times import run_sweeps
from sparksmithwaterman_tpu.metrics.refset_info import get_info, print_all_info
from sparksmithwaterman_tpu.metrics.running_median import RunningMedian


class TestRunningMedian:
    def test_matches_statistics_median(self, rng):
        rm = RunningMedian()
        values = []
        for v in rng.integers(0, 1000, 101):
            values.append(int(v))
            got = rm.add(int(v))
            assert got == pytest.approx(statistics.median(values))

    def test_empty_median_zero(self):
        assert RunningMedian().median == 0.0

    def test_journal_file(self, tmp_path):
        path = str(tmp_path / "medians.txt")
        rm = RunningMedian(path)
        for v in (3, 1, 2):
            rm.add(v)
        rm.close()
        lines = open(path).read().splitlines()
        assert lines == ["3.0", "2.0", "2.0"]


class TestEngineerData:
    def test_read_num_sweep(self, tmp_path):
        paths = engineer_data.change_read_num(str(tmp_path), scale=0.1)
        reads0 = get_reads(paths[0], ">gi")
        reads1 = get_reads(paths[1], ">gi")
        assert len(reads0) == 20 and len(reads1) == 50
        assert all(len(r) == 80 for r in reads0)

    def test_read_len_sweep(self, tmp_path):
        paths = engineer_data.change_read_len(str(tmp_path), scale=0.1)
        for k, path in enumerate(paths, start=1):
            reads = get_reads(path, ">gi")
            assert len(reads) == 5
            assert all(len(r) == 20 * k for r in reads)

    def test_ref_num_sweep(self, tmp_path):
        paths = engineer_data.change_ref_num(str(tmp_path), scale=0.1)
        for want, path in zip((1, 10), paths):
            seqs = get_ref_seqs(path, ">gi")
            assert len(seqs) == want
            assert all(len(s) == 400 for _, s in seqs)
            assert all(m.startswith(">gi|ref") for m, _ in seqs)

    def test_ref_len_sweep(self, tmp_path):
        paths = engineer_data.change_ref_len(str(tmp_path), scale=0.1)
        seqs0 = get_ref_seqs(paths[0], ">gi")
        seqs1 = get_ref_seqs(paths[1], ">gi")
        assert len(seqs0) == 1 and len(seqs0[0][1]) == 80
        assert len(seqs1[0][1]) == 400

    def test_generate_layout(self, tmp_path):
        engineer_data.generate(str(tmp_path), scale=0.05)
        for sub in (
            "input/readNum",
            "input/readLen",
            "testRef/refNum",
            "testRef/refLen",
            "input/ref",
            "testRef/in",
        ):
            assert os.path.exists(tmp_path / sub), sub


class TestRefSetInfo:
    def test_get_info(self, tmp_path):
        ref_dir = tmp_path / "refs"
        engineer_data.change_ref_num(str(ref_dir), scale=0.1)
        info = get_info(str(ref_dir))
        assert info.num_files == 2
        assert info.num_seqs == 11
        assert info.total_bp == 11 * 400
        assert info.min_bp == info.max_bp == 400
        assert info.mean_bp == 400.0
        assert info.median_bp == 400.0

    def test_print_all_info_format(self, tmp_path):
        ref_dir = tmp_path / "refs"
        engineer_data.change_ref_num(str(ref_dir), scale=0.1)
        out = str(tmp_path / "info.txt")
        print_all_info(str(ref_dir), out)
        text = open(out).read()
        assert "# files  =  2" in text
        assert "# reference sequences  =  11" in text
        assert "File Name" in text and "|# Sequences" in text
        assert "-----------------------------------+-----------" in text

    def test_threaded_matches_serial(self, tmp_path):
        """The threaded rewrite (the reference's abandoned
        threadedMetrics.InfoRefSet stub, built for real) is
        result-identical to the serial crawl, report included."""
        from sparksmithwaterman_tpu.metrics.threaded_refset_info import (
            get_info_threaded,
            print_all_info_threaded,
        )
        from sparksmithwaterman_tpu.metrics.refset_info import format_info

        ref_dir = tmp_path / "refs"
        engineer_data.change_ref_num(str(ref_dir), scale=0.2)
        engineer_data.change_ref_len(str(ref_dir / "lens"), scale=0.1)
        serial = get_info(str(ref_dir))
        threaded = get_info_threaded(str(ref_dir), workers=5)
        assert format_info(threaded) == format_info(serial)
        out = str(tmp_path / "tinfo.txt")
        print_all_info_threaded(str(ref_dir), out, workers=3)
        assert open(out).read() == format_info(serial)

    def test_threaded_empty_dir(self, tmp_path):
        from sparksmithwaterman_tpu.metrics.threaded_refset_info import (
            get_info_threaded,
        )

        ref_dir = tmp_path / "empty"
        ref_dir.mkdir()
        info = get_info_threaded(str(ref_dir))
        assert info.num_files == 0 and info.num_seqs == 0
        assert info.median_bp == 0.0 and info.mean_bp == 0.0


class TestExecutionTimes:
    def test_run_sweeps_end_to_end(self, tmp_path):
        data = tmp_path / "data"
        engineer_data.generate(str(data), scale=0.05)
        results = run_sweeps(
            str(data), str(tmp_path / "out"), "batch", ("read_len", "ref_len")
        )
        assert set(results) == {"read_len", "ref_len"}
        assert all(row["ms"] >= 0 for rows in results.values() for rows2 in [rows] for row in rows2)
        summary = tmp_path / "out" / "batch" / "read_len_summary.json"
        assert json.load(open(summary)) == results["read_len"]


def test_scaling_harness_virtual_mesh():
    # 8 virtual CPU devices (conftest): mechanics + cross-mesh parity.
    from sparksmithwaterman_tpu.metrics.scaling import measure_scaling

    rows = measure_scaling(
        [1, 2, 4], num_reads=8, read_len=16, num_refs=8, ref_len=64, iters=1
    )
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
        assert r["gcups"] > 0


def test_scaling_harness_seq_axis():
    # Sequence-parallel strong scaling: same mechanics, seq mesh axis.
    from sparksmithwaterman_tpu.metrics.scaling import measure_scaling

    rows = measure_scaling(
        [1, 2, 8], num_reads=4, read_len=16, ref_len=128, iters=1, axis="seq"
    )
    assert [r["devices"] for r in rows] == [1, 2, 8]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
        assert r["gcups"] > 0
