"""Corpus-scale sustained run (VERDICT r3 task 2): generate a ~1 Gbp
RefSeq-shaped reference corpus + a read set, run the SHIPPED pipeline
(`run_pipeline`, strategy shard_refs) end-to-end on the TPU, and record
sustained real GCUPS, reads/s, and the host/device split.

The corpus is cached outside the repo (env CORPUS_DIR, default
/tmp/swtpu_corpus) — only the measured numbers are committed.

Usage:
  python experiments/corpus_scale.py              # 1 Gbp x 512 reads
  CORPUS_GBP=0.1 CORPUS_READS=2048 python experiments/corpus_scale.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

GBP = float(os.environ.get("CORPUS_GBP", "1.0"))
N_READS = int(os.environ.get("CORPUS_READS", "512"))
BASE = os.environ.get("CORPUS_DIR", "/tmp/swtpu_corpus")
SEED = 7

def generate(base, gbp, n_reads):
    """RefSeq-shaped corpus via the package generator
    (`metrics.engineer_data.refseq_like` / `reads_file` — one
    implementation shared with bench.py's pipeline metric).  Cached by
    tag; an existing corpus is never regenerated, so numbers recorded
    against a cached tag stay comparable."""
    from sparksmithwaterman_tpu.metrics.engineer_data import (
        reads_file,
        refseq_like,
    )

    tag = f"g{gbp}_r{n_reads}_s{SEED}"
    root = os.path.join(base, tag)
    marker = os.path.join(root, ".done")
    if os.path.exists(marker):
        return root
    t0 = time.perf_counter()
    meta = refseq_like(
        os.path.join(root, "refs"), int(gbp * 1e9), seed=SEED
    )
    reads_bp = reads_file(
        os.path.join(root, "inputs", "input1.fa"), n_reads
    )
    with open(marker, "w") as f:
        json.dump(
            {"ref_bp": meta["ref_bp"], "files": meta["files"],
             "reads": n_reads, "read_bp": reads_bp},
            f,
        )
    print(f"generated {meta['ref_bp']/1e9:.3f} Gbp in {meta['files']} "
          f"files, {n_reads} reads ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    return root


root = generate(BASE, GBP, N_READS)
meta = json.load(open(os.path.join(root, ".done")))

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io import get_reads
from sparksmithwaterman_tpu.models.aligner import get_backend
from sparksmithwaterman_tpu.models.pipeline import run_pipeline

out_dir = os.path.join(root, "out")
config = AlignConfig(
    ref_dir=os.path.join(root, "refs"),
    in_dir=os.path.join(root, "inputs"),
    out_dir=out_dir,
    strategy=os.environ.get("CORPUS_STRATEGY", "shard_refs"),
)
backend = get_backend(config)
reads = get_reads(os.path.join(root, "inputs", "input1.fa"), config.delimiter)
read_bp = sum(map(len, reads))

# Traceback share (VERDICT r4 task 1 wants it in the read-scale table):
# wrap the winner-traceback entry point with a wall timer.
_tb_s = [0.0]
_orig_sites = backend.sites_for_ref


def _timed_sites(ref_seq, reads_):
    t0 = time.perf_counter()
    out = _orig_sites(ref_seq, reads_)
    _tb_s[0] += time.perf_counter() - t0
    return out


backend.sites_for_ref = _timed_sites

t0 = time.perf_counter()
paths = run_pipeline(config, backend=backend)
wall = time.perf_counter() - t0
tb_cold_s = _tb_s[0]

# Optional WARM pass (CORPUS_PASSES=2): same process, so the one-time
# per-process compile/cache-load warmup (~250-330 s through the remote
# compile tunnel, independent of corpus size) is excluded — the rate a
# long-lived service process sustains.
warm_wall = warm_tb_s = None
if int(os.environ.get("CORPUS_PASSES", "1")) > 1:
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    _tb_s[0] = 0.0
    t0 = time.perf_counter()
    paths = run_pipeline(config, backend=backend)
    warm_wall = time.perf_counter() - t0
    warm_tb_s = _tb_s[0]

real_cells = read_bp * meta["ref_bp"]
report = open(paths[0]).read()
exec_ms = int(report.split("Execution Time = ")[1].split(" ms")[0])
dev = backend.gcups
result = {
    "corpus_gbp": meta["ref_bp"] / 1e9,
    "ref_files": meta["files"],
    "n_reads": len(reads),
    "read_bp": read_bp,
    "real_cells": real_cells,
    "wall_s": round(wall, 1),
    "exec_ms": exec_ms,
    "sustained_gcups": round(real_cells / wall / 1e9, 1),
    "reads_per_s": round(len(reads) / wall, 1),
    "mbp_per_s": round(meta["ref_bp"] / wall / 1e6, 1),
    "device_dispatch_s": round(dev.seconds, 1),
    "device_dispatch_frac": round(dev.seconds / wall, 3),
    "dispatch_calls": dev.calls,
    "traceback_s": round(tb_cold_s, 1),
    "traceback_frac": round(tb_cold_s / wall, 3),
    "warm_wall_s": round(warm_wall, 1) if warm_wall else None,
    "warm_sustained_gcups": (
        round(real_cells / warm_wall / 1e9, 1) if warm_wall else None
    ),
    "warm_traceback_s": round(warm_tb_s, 1) if warm_tb_s is not None else None,
    "max_score_line": report.split("Maximum alignment score = ")[1].split("\n")[0],
}
print(json.dumps(result))
