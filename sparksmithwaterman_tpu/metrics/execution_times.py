"""Execution-time scaling sweeps.

Capability mirror of the reference's three benchmark harnesses
(``src/metrics/ExecutionTimesControl.java``, ``ExecutionTimesAlgorithm.java``,
``ExecutionTimesReference.java`` — identical apart from the strategy), with
the strategy a parameter instead of a class.  The four tests:

1. **read_num** — vary #reads       (in: ``input/readNum``, ref: ``testRef/in``)
2. **read_len** — vary read length  (in: ``input/readLen``, ref: ``testRef/in``)
3. **ref_num**  — vary #references  (in: ``input/ref``, ref: ``testRef/refNum/refK``)
4. **ref_len**  — vary ref length   (in: ``input/ref``, ref: ``testRef/refLen/refK``)

Each run writes the standard report (execution time embedded, as the
reference does); additionally a machine-readable ``summary.json`` with
(sweep, case, ms) rows is emitted per sweep — the reference leaves times
scattered across report files only.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Sequence

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.models.pipeline import run_pipeline

_TIME_RE = re.compile(r"Execution Time = (\d+) ms")


def _exec_times(report_paths: Sequence[str]) -> List[int]:
    times = []
    for path in report_paths:
        with open(path) as f:
            m = _TIME_RE.search(f.read())
        times.append(int(m.group(1)) if m else -1)
    return times


def _subdirs(parent: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(parent)):
        full = os.path.join(parent, name)
        if os.path.isdir(full):
            out.append(full)
    return out


def run_sweeps(
    data_dir: str,
    out_dir: str,
    strategy: str = "batch",
    sweeps: Sequence[str] = ("read_num", "read_len", "ref_num", "ref_len"),
) -> Dict[str, List[dict]]:
    """Run the requested sweeps; returns {sweep: [{case, ms}, ...]}."""
    results: Dict[str, List[dict]] = {}

    def align(ref_dir: str, in_dir: str, sub_out: str, out_name: str = "result"):
        config = AlignConfig(
            ref_dir=ref_dir,
            in_dir=in_dir,
            out_dir=os.path.join(out_dir, strategy, sub_out),
            out_name=out_name,
            strategy=strategy,
        )
        return run_pipeline(config)

    # Tests 1+2: one run over a directory of many input files; each input
    # file is one sweep case (ExecutionTimesControl.java:43-76).
    for sweep, in_sub in (("read_num", "readNum"), ("read_len", "readLen")):
        if sweep not in sweeps:
            continue
        paths = align(
            os.path.join(data_dir, "testRef", "in"),
            os.path.join(data_dir, "input", in_sub),
            in_sub,
        )
        results[sweep] = [
            {"case": os.path.basename(p), "ms": ms}
            for p, ms in zip(paths, _exec_times(paths))
        ]

    # Tests 3+4: one run per reference subdir
    # (ExecutionTimesControl.java:79-127).
    for sweep, ref_sub in (("ref_num", "refNum"), ("ref_len", "refLen")):
        if sweep not in sweeps:
            continue
        rows = []
        parent = os.path.join(data_dir, "testRef", ref_sub)
        for k, ref_dir in enumerate(_subdirs(parent), start=1):
            paths = align(
                ref_dir,
                os.path.join(data_dir, "input", "ref"),
                ref_sub,
                out_name=f"result{k}_",
            )
            for p, ms in zip(paths, _exec_times(paths)):
                rows.append({"case": f"{os.path.basename(ref_dir)}/{os.path.basename(p)}", "ms": ms})
        results[sweep] = rows

    for sweep, rows in results.items():
        summary = os.path.join(out_dir, strategy, f"{sweep}_summary.json")
        os.makedirs(os.path.dirname(summary), exist_ok=True)
        with open(summary, "w") as f:
            json.dump(rows, f, indent=1)
    return results
