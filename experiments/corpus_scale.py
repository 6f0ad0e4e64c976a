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

_B = np.frombuffer(b"ACGT", np.uint8)


def _seq(rng, n):
    return _B[rng.integers(0, 4, size=n)].tobytes().decode()


def generate(base, gbp, n_reads):
    """RefSeq-shaped corpus: files of ~candidate seqs with lengths drawn
    500-4000bp (mean ~2250, like the bench mix), ~2 Mbp per file."""
    tag = f"g{gbp}_r{n_reads}_s{SEED}"
    root = os.path.join(base, tag)
    marker = os.path.join(root, ".done")
    ref_dir = os.path.join(root, "refs")
    in_dir = os.path.join(root, "inputs")
    if os.path.exists(marker):
        return root
    os.makedirs(ref_dir, exist_ok=True)
    os.makedirs(in_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    total_bp = int(gbp * 1e9)
    written = 0
    fi = 0
    t0 = time.perf_counter()
    while written < total_bp:
        fi += 1
        parts = []
        file_bp = 0
        while file_bp < 2_000_000 and written + file_bp < total_bp:
            n = int(rng.integers(500, 4000))
            parts.append(f">gi|{fi}|{len(parts)}|synthetic\n{_seq(rng, n)}")
            file_bp += n
        with open(os.path.join(ref_dir, f"ref{fi}.rna.fna"), "w") as f:
            f.write("\n".join(parts))
        written += file_bp
    reads = [_seq(rng, int(l)) for l in rng.integers(80, 151, size=n_reads)]
    with open(os.path.join(in_dir, "input1.fa"), "w") as f:
        f.write("\n".join(reads))
    with open(marker, "w") as f:
        json.dump({"ref_bp": written, "files": fi, "reads": n_reads}, f)
    print(f"generated {written/1e9:.3f} Gbp in {fi} files, "
          f"{n_reads} reads ({time.perf_counter()-t0:.0f}s)", flush=True)
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

t0 = time.perf_counter()
paths = run_pipeline(config, backend=backend)
wall = time.perf_counter() - t0

# Optional WARM pass (CORPUS_PASSES=2): same process, so the one-time
# per-process compile/cache-load warmup (~250-330 s through the remote
# compile tunnel, independent of corpus size) is excluded — the rate a
# long-lived service process sustains.
warm_wall = None
if int(os.environ.get("CORPUS_PASSES", "1")) > 1:
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    paths = run_pipeline(config, backend=backend)
    warm_wall = time.perf_counter() - t0

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
    "warm_wall_s": round(warm_wall, 1) if warm_wall else None,
    "warm_sustained_gcups": (
        round(real_cells / warm_wall / 1e9, 1) if warm_wall else None
    ),
    "max_score_line": report.split("Maximum alignment score = ")[1].split("\n")[0],
}
print(json.dumps(result))
