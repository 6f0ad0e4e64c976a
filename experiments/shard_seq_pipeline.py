"""shard_seq through the SHIPPED pipeline on a corpus-shaped mixed-
length long-ref workload (VERDICT r4 task 4).

The band ring had only ever been measured standalone at one synthetic
uniform shape (256x128bp vs 64x3kb).  This drives `run_pipeline
--strategy shard_seq` over mixed 8 kb - 1 Mb references (the regime the
strategy exists for: refs too long for one core's VMEM at pod scale),
counts the compiled (group-length, chunk-count) shapes the ladder
quantization produces, measures the sustained rate, and diffs the
report against the batch strategy for parity.

Run: python experiments/shard_seq_pipeline.py
"""

import json
import os
import shutil
import time

import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.metrics.engineer_data import _fast_seq, _write

BASE = os.environ.get("SEQ_DIR", "/tmp/swtpu_seqpipe")
TOTAL_BP = int(float(os.environ.get("SEQ_BP", "16e6")))
N_READS = int(os.environ.get("SEQ_READS", "256"))


def generate(root):
    marker = os.path.join(root, ".done")
    if os.path.exists(marker):
        return json.load(open(marker))
    rng = np.random.default_rng(9)
    total = 0
    refs = []
    while total < TOTAL_BP:
        # log-uniform 8 kb .. 1 Mb
        n = int(np.exp(rng.uniform(np.log(8e3), np.log(1e6))))
        refs.append(n)
        total += n
    lines = []
    for i, n in enumerate(refs):
        lines.append(f">gi|{i}|seqp{i}")
        lines.append(_fast_seq(rng, n))
    _write(os.path.join(root, "refs", "refs1.rna.fna"), "\n".join(lines))
    reads = [
        _fast_seq(rng, int(l))
        for l in rng.integers(80, 151, size=N_READS)
    ]
    _write(os.path.join(root, "inputs", "input1.fa"), "\n".join(reads))
    meta = {
        "ref_bp": total,
        "n_refs": len(refs),
        "lens": refs,
        "read_bp": sum(map(len, reads)),
    }
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def count_shapes(lens, size, ref_bucket=256):
    from sparksmithwaterman_tpu.models.batch_backend import _quantize_15

    quantum = size * ref_bucket
    return sorted({_quantize_15(max(n, 1), quantum) for n in lens})


def one_pass(strategy, root, tag):
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.pipeline import run_pipeline

    out = os.path.join(root, f"out_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    cfg = AlignConfig(
        ref_dir=os.path.join(root, "refs"),
        in_dir=os.path.join(root, "inputs"),
        out_dir=out,
        strategy=strategy,
    )
    t0 = time.perf_counter()
    paths = run_pipeline(cfg)
    return time.perf_counter() - t0, paths[0]


def main():
    enable_compile_cache()
    root = os.path.join(BASE, f"bp{TOTAL_BP}_r{N_READS}")
    meta = generate(root)
    cells = meta["read_bp"] * meta["ref_bp"]
    shapes = count_shapes(meta["lens"], size=1)
    print(
        f"{meta['n_refs']} refs, {meta['ref_bp']/1e6:.1f} Mbp "
        f"(8kb-1Mb log-uniform), {N_READS} reads; ladder shapes: "
        f"{len(shapes)} {shapes}"
    )
    w0, _ = one_pass("shard_seq", root, "seq_warm")
    w1, rep_seq = one_pass("shard_seq", root, "seq")
    print(
        f"shard_seq: warm-pass {w1:.1f} s = {cells/w1/1e9:.1f} real GCUPS "
        f"(first pass {w0:.1f} s incl. compiles)"
    )
    b0, _ = one_pass("batch", root, "batch_warm")
    b1, rep_batch = one_pass("batch", root, "batch")
    print(f"batch:     warm-pass {b1:.1f} s = {cells/b1/1e9:.1f} real GCUPS")
    strip = lambda p: [
        l for l in open(p).read().splitlines() if "Execution Time" not in l
    ]
    parity = strip(rep_seq) == strip(rep_batch)
    print(f"report parity vs batch: {'OK' if parity else 'FAIL'}")


if __name__ == "__main__":
    main()
