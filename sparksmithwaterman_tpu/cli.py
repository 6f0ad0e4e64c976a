"""Command-line interface.

The reference has no general-purpose CLI — every entry point is a
``main()`` with hardcoded paths (``src/metrics/ExecutionTimes*.java``).
This CLI exposes the same capability surface with real flags:

- ``align``  — run the comparison pipeline (any strategy)
- ``info``   — dataset statistics (RefSetInfo equivalent)
- ``gen``    — synthetic benchmark corpora (EngineerData equivalent)
- ``bench``  — execution-time sweeps (ExecutionTimes* equivalent)
"""

from __future__ import annotations

import argparse
import sys


def _add_align(sub):
    p = sub.add_parser("align", help="run the alignment pipeline")
    p.add_argument("--ref-dir", required=True)
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--out-name", default="result")
    p.add_argument("--out-ext", default=".txt")
    p.add_argument("--delimiter", default=">gi")
    p.add_argument("--match", type=int, default=5)
    p.add_argument("--mismatch", type=int, default=-3)
    p.add_argument("--gap", type=int, default=-4)
    p.add_argument(
        "--strategy",
        default="batch",
        choices=["serial", "batch", "wavefront", "shard_refs", "shard_reads", "shard_seq"],
    )
    p.add_argument(
        "--tie-semantics",
        default="serial",
        choices=["serial", "distributed"],
        help="tied-path direction engine: 'serial' = "
        "SmithWaterman.GetCellScore (ties a>i>d, the NoDistribution/"
        "DistributeReference engine), 'distributed' = "
        "DistributedSW.GetCellScore (strict '>', ties d>i>a — "
        "reproduces DistributeAlgorithm's alignment strings)",
    )
    p.add_argument(
        "--resume",
        action="store_true",
        help="skip input files already completed per the out-dir journal",
    )
    p.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace of the run to this directory",
    )


def _add_info(sub):
    p = sub.add_parser("info", help="reference dataset statistics")
    p.add_argument("--ref-dir", required=True)
    p.add_argument("--out-file", required=True)
    p.add_argument("--delimiter", default=">gi")
    p.add_argument(
        "--threads",
        type=int,
        default=1,
        help="parse files on a thread pool (the reference's abandoned "
        "threadedMetrics rewrite, implemented)",
    )


def _add_gen(sub):
    p = sub.add_parser("gen", help="generate synthetic benchmark corpora")
    p.add_argument("--out-dir", required=True)
    p.add_argument(
        "--sweeps",
        nargs="+",
        default=["read_num", "read_len", "ref_num", "ref_len"],
        choices=["read_num", "read_len", "ref_num", "ref_len"],
    )
    p.add_argument(
        "--scale",
        type=float,
        default=1.0,
        help="shrink sweep sizes (1.0 = the reference's full corpus)",
    )


def _add_bench(sub):
    p = sub.add_parser("bench", help="execution-time sweeps")
    p.add_argument("--data-dir", required=True, help="dir from `gen`")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--strategy", default="batch")
    p.add_argument(
        "--sweeps",
        nargs="+",
        default=["read_num", "read_len", "ref_num", "ref_len"],
        choices=["read_num", "read_len", "ref_num", "ref_len"],
    )


def _add_diff(sub):
    p = sub.add_parser(
        "diff",
        help="run two strategies on the same data and diff the reports "
        "(the reference's control-output workflow, "
        "src/sw/Distribution.java:48-50, as a first-class tool)",
    )
    p.add_argument("--ref-dir", required=True)
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--delimiter", default=">gi")
    p.add_argument("--match", type=int, default=5)
    p.add_argument("--mismatch", type=int, default=-3)
    p.add_argument("--gap", type=int, default=-4)
    p.add_argument(
        "--tie-semantics", default="serial", choices=["serial", "distributed"]
    )
    strategies = ["serial", "batch", "wavefront", "shard_refs", "shard_reads", "shard_seq"]
    p.add_argument("--strategy-a", default="serial", choices=strategies)
    p.add_argument("--strategy-b", default="batch", choices=strategies)


def _add_scaling(sub):
    p = sub.add_parser(
        "scaling",
        help="multi-device strong-scaling sweep (refs or seq mesh axis)",
    )
    p.add_argument(
        "--axis",
        default="refs",
        choices=["refs", "seq"],
        help="refs = shard the reference set; seq = length-shard ONE "
        "reference (ppermute wavefront)",
    )
    p.add_argument(
        "--devices",
        default=None,
        help="comma-separated device counts, e.g. 1,2,4,8 (default: powers of 2 up to available)",
    )
    p.add_argument("--num-reads", type=int, default=32)
    p.add_argument("--read-len", type=int, default=64)
    p.add_argument("--num-refs", type=int, default=64)
    p.add_argument("--ref-len", type=int, default=512)


def enable_compile_cache() -> None:
    """Persist XLA executables across processes.

    Every distinct batch shape is a compile; on a remote-compile TPU
    tunnel a cold Pallas compile costs minutes.  Shape quantization (see
    models/batch_backend.py) bounds the shape set; this cache makes the
    survivors one-time."""
    import os

    import jax

    cache_dir = os.environ.get(
        "SWTPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "swtpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs


def _apply_platform() -> None:
    """Honor SWTPU_PLATFORM, falling back to JAX_PLATFORMS (e.g. 'cpu').

    ``jax.config.update('jax_platforms', ...)`` is applied on top of the
    env var: site customization may import jax (and fix its env-var
    read, possibly to a different platform) before this process's
    environment is consulted, while the config update takes effect at
    lazy backend initialization.
    """
    import os

    platform = os.environ.get("SWTPU_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass  # backend already initialized; use whatever is live


def main(argv=None) -> int:
    _apply_platform()
    enable_compile_cache()
    parser = argparse.ArgumentParser(
        prog="sparksmithwaterman_tpu",
        description="TPU-native Smith-Waterman alignment engine",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    _add_align(sub)
    _add_info(sub)
    _add_gen(sub)
    _add_bench(sub)
    _add_diff(sub)
    _add_scaling(sub)
    args = parser.parse_args(argv)

    if args.command == "align":
        from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
        from sparksmithwaterman_tpu.models.pipeline import run_pipeline

        config = AlignConfig(
            ref_dir=args.ref_dir,
            in_dir=args.in_dir,
            out_dir=args.out_dir,
            out_name=args.out_name,
            out_ext=args.out_ext,
            delimiter=args.delimiter,
            scoring=ScoringScheme(
                match=args.match,
                mismatch=args.mismatch,
                gap=args.gap,
                tie_semantics=args.tie_semantics,
            ),
            strategy=args.strategy,
        )
        from sparksmithwaterman_tpu.utils.profiling import profiler_trace

        with profiler_trace(args.profile_dir):
            paths = run_pipeline(config, resume=args.resume)
        for p in paths:
            print(p)
        return 0

    if args.command == "info":
        if args.threads > 1:
            from sparksmithwaterman_tpu.metrics.threaded_refset_info import (
                print_all_info_threaded,
            )

            print_all_info_threaded(
                args.ref_dir, args.out_file, args.delimiter, args.threads
            )
        else:
            from sparksmithwaterman_tpu.metrics.refset_info import print_all_info

            print_all_info(args.ref_dir, args.out_file, args.delimiter)
        print(args.out_file)
        return 0

    if args.command == "gen":
        from sparksmithwaterman_tpu.metrics import engineer_data

        engineer_data.generate(args.out_dir, args.sweeps, scale=args.scale)
        print(args.out_dir)
        return 0

    if args.command == "bench":
        import json

        from sparksmithwaterman_tpu.metrics.execution_times import run_sweeps

        results = run_sweeps(
            args.data_dir, args.out_dir, args.strategy, args.sweeps
        )
        print(json.dumps(results, indent=1))
        return 0

    if args.command == "diff":
        from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
        from sparksmithwaterman_tpu.metrics.diff import diff_strategies

        config = AlignConfig(
            ref_dir=args.ref_dir,
            in_dir=args.in_dir,
            out_dir=args.out_dir,  # replaced per strategy inside
            delimiter=args.delimiter,
            scoring=ScoringScheme(
                match=args.match,
                mismatch=args.mismatch,
                gap=args.gap,
                tie_semantics=args.tie_semantics,
            ),
        )
        all_equal, rows = diff_strategies(
            config, args.strategy_a, args.strategy_b, args.out_dir
        )
        for row in rows:
            status = "OK " if row["equal"] else "DIFF"
            print(f"{status} {row['file']}")
            if row["diff"]:
                print(row["diff"], end="")
        print(
            f"{'identical' if all_equal else 'DIVERGED'}: "
            f"{args.strategy_a} vs {args.strategy_b} "
            f"({len(rows)} report(s), timing line ignored)"
        )
        return 0 if all_equal else 1

    if args.command == "scaling":
        import json

        from sparksmithwaterman_tpu.metrics.scaling import measure_scaling

        counts = (
            [int(x) for x in args.devices.split(",")] if args.devices else None
        )
        rows = measure_scaling(
            counts,
            num_reads=args.num_reads,
            read_len=args.read_len,
            num_refs=args.num_refs,
            ref_len=args.ref_len,
            axis=args.axis,
        )
        print(json.dumps(rows, indent=1))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
