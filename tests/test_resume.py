"""Checkpoint/resume + profiling counter tests."""

import os

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.models.pipeline import run_pipeline
from sparksmithwaterman_tpu.utils.profiling import GcupsCounter


def _setup(tmp_path):
    refs = tmp_path / "refs"
    inputs = tmp_path / "in"
    refs.mkdir(), inputs.mkdir()
    (refs / "ref1.rna.fna").write_text(">gi|1|a\nAACGTACGTTT\n")
    (inputs / "input1.fa").write_text("ACGTACGT\n")
    (inputs / "input2.fa").write_text("CGTA\n")
    return AlignConfig(
        ref_dir=str(refs),
        in_dir=str(inputs),
        out_dir=str(tmp_path / "out"),
        strategy="batch",
        read_bucket=8,
        ref_bucket=16,
    )


def test_resume_skips_completed(tmp_path):
    config = _setup(tmp_path)
    paths1 = run_pipeline(config)
    assert len(paths1) == 2
    texts = [open(p).read() for p in paths1]

    # Delete one report; resume regenerates only that one, reusing the
    # journal for the other.
    os.remove(paths1[0])
    mtime1 = os.path.getmtime(paths1[1])
    paths2 = run_pipeline(config, resume=True)
    assert paths2 == paths1
    assert os.path.getmtime(paths1[1]) == mtime1  # untouched
    assert open(paths1[0]).read().split("\n", 1)[1] == texts[0].split("\n", 1)[1]


def test_resume_detects_modified_input(tmp_path):
    config = _setup(tmp_path)
    paths1 = run_pipeline(config)
    in2 = os.path.join(config.in_dir, "input2.fa")
    with open(in2, "w") as f:
        f.write("TTTT\n")
    os.utime(in2, (0, 0))  # force mtime change
    paths2 = run_pipeline(config, resume=True)
    assert "TTTT" in open(paths2[1]).read()


def test_gcups_counter_accumulates(tmp_path):
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    config = _setup(tmp_path)
    backend = BatchBackend(config)
    backend.totals(["ACGT", "GGTT"], ["AACGTACGTTT"])
    assert backend.gcups.cells == (4 + 4) * 11
    assert backend.gcups.seconds > 0
    assert "GCUPS" in backend.gcups.report()


def test_counter_measure():
    c = GcupsCounter()
    with c.measure(1000):
        pass
    assert c.calls == 1 and c.cells == 1000
