"""Control-vs-treatment diff runner.

The reference's entire testing story is parallel output directories for
manual diffing — ``OUT_DIR_CONTROL`` / ``OUT_DIR_ALGORITHM`` /
``OUT_DIR_REFERENCE`` (``src/sw/Distribution.java:48-50``), one report
per strategy, compared by eye.  This module makes that workflow a
first-class tool (VERDICT r2 task 8): run TWO strategies on the same
input and reference directories, compare the reports pairwise modulo
the timing line, and report any divergence.

The timing line (``Execution Time = N ms``, ``InOutOps.java:249``) is
the only legitimately nondeterministic report content; everything else
— winner set, ordering, alignment strings, site indices — must match
byte-for-byte between strategies (unlike the reference, whose two
engines disagree on tied paths; here tie semantics are a scoring
parameter, not a strategy side effect).
"""

from __future__ import annotations

import dataclasses
import difflib
import os
import re
from typing import Dict, List, Tuple

from sparksmithwaterman_tpu.config import AlignConfig

_TIMING_RE = re.compile(r"Execution Time = \d+ ms")


def _normalize(text: str) -> str:
    return _TIMING_RE.sub("Execution Time = <t> ms", text)


def diff_strategies(
    config: AlignConfig,
    strategy_a: str,
    strategy_b: str,
    out_dir: str,
) -> Tuple[bool, List[Dict[str, object]]]:
    """Run two strategies on the same data; diff their reports.

    Writes reports under ``out_dir/<strategy_a>/`` and
    ``out_dir/<strategy_b>/`` (the reference's parallel-output-dirs
    layout).  Returns (all_equal, rows) where each row is
    ``{"file", "equal", "diff"}`` — ``diff`` holds a unified diff of
    the normalized reports when they diverge (empty when equal).
    """
    from sparksmithwaterman_tpu.models.pipeline import run_pipeline

    paths: Dict[str, List[str]] = {}
    for strategy in (strategy_a, strategy_b):
        cfg = dataclasses.replace(
            config,
            strategy=strategy,
            out_dir=os.path.join(out_dir, strategy),
        )
        paths[strategy] = run_pipeline(cfg)

    rows: List[Dict[str, object]] = []
    all_equal = True
    pa, pb = paths[strategy_a], paths[strategy_b]
    if len(pa) != len(pb):  # pragma: no cover - same inputs, same count
        raise RuntimeError(
            f"strategy outputs differ in count: {len(pa)} vs {len(pb)}"
        )
    for a_path, b_path in zip(pa, pb):
        with open(a_path) as f:
            a_text = _normalize(f.read())
        with open(b_path) as f:
            b_text = _normalize(f.read())
        equal = a_text == b_text
        diff = ""
        if not equal:
            all_equal = False
            diff = "".join(
                difflib.unified_diff(
                    a_text.splitlines(keepends=True),
                    b_text.splitlines(keepends=True),
                    fromfile=f"{strategy_a}/{os.path.basename(a_path)}",
                    tofile=f"{strategy_b}/{os.path.basename(b_path)}",
                )
            )
        rows.append(
            {"file": os.path.basename(a_path), "equal": equal, "diff": diff}
        )
    return all_equal, rows
