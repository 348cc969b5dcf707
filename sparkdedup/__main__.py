"""CLI entry point (difPy O25, `/root/reference/difPy/dif.py:975-1043`).

Mirrors the reference's argparse surface, re-targeted at tables:

    spark-submit --py-files sparkdedup.zip -m sparkdedup \\
        -D /data/files.parquet -s similar -ro True -Z /out

or locally: ``python -m sparkdedup -D <parquet-or-table> [...]``.

Outputs, as in the reference CLI (dif.py:1017-1031): timestamped
``*_results.json`` (difPy-shaped dict — only when the match count is
collectable), ``*_lower_quality.txt`` and ``*_stats.json``, plus the
DataFrame-native sinks: ``clusters/`` ``ranked/`` ``lower_quality/``
``invalid/`` parquet tables and an optional ``actions/`` table in place
of filesystem move/delete (O20/O21 — a distributed engine emits
side-effects as data).
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime, timezone


def _strtobool(v: str) -> bool:
    # difPy uses distutils strtobool semantics (dif.py:958-967)
    s = str(v).lower()
    if s in ("y", "yes", "t", "true", "on", "1"):
        return True
    if s in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value {v!r}")


def _similarity(v: str):
    try:
        return float(v)
    except ValueError:
        return v


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sparkdedup",
        description="Find duplicate or similar files in source-code "
                    "tables with sparkdedup (a PySpark-native rebuild of "
                    "difPy's capabilities).")
    b = lambda x: bool(_strtobool(x))  # noqa: E731
    p.add_argument("-D", "--directory", type=str, nargs="+", required=True,
                   help="Input tables: parquet paths or table names.")
    p.add_argument("-Z", "--output_directory", type=str, default=None,
                   help="Output directory for result files/tables.")
    p.add_argument("-r", "--recursive", type=b, default=True,
                   choices=[True, False],
                   help="Include files in subdirectories of each repo.")
    p.add_argument("-i", "--in_folder", type=b, default=False,
                   choices=[True, False],
                   help="Search for matches within each repo separately.")
    p.add_argument("-le", "--limit_extensions", type=b, default=True,
                   choices=[True, False],
                   help="Limit search to known source-file extensions.")
    p.add_argument("-px", "--px_size", type=int, default=128,
                   help="Signature resolution (MinHash permutations).")
    p.add_argument("-k", "--shingle_k", type=int, default=7,
                   help="Character shingle width.")
    p.add_argument("-s", "--similarity", type=_similarity,
                   default="duplicates",
                   help="'duplicates', 'similar', or max distance in "
                        "(1 - estimated Jaccard).")
    p.add_argument("-ro", "--rotate", type=b, default=True,
                   choices=[True, False],
                   help="Run the suffix-array containment stage (the "
                        "difPy rotate analogue).")
    p.add_argument("-dim", "--same_dim", type=b, default=False,
                   choices=[True, False],
                   help="Only compare files in the same length bucket.")
    p.add_argument("-mv", "--move_to", type=str, default=None,
                   help="Emit an actions table moving lower-quality "
                        "files to this destination.")
    p.add_argument("-d", "--delete", type=b, default=False,
                   choices=[True, False],
                   help="Emit an actions table deleting lower-quality files.")
    p.add_argument("-sd", "--silent_del", type=b, default=False,
                   choices=[True, False],
                   help="Accepted for reference-CLI compatibility (the "
                        "actions table never prompts).")
    p.add_argument("-proc", "--processes", type=int,
                   default=os.cpu_count(),
                   help="Parallelism (local master threads / shuffle "
                        "partitions).")
    p.add_argument("-ch", "--chunksize", type=int, default=None,
                   help="Arrow records per batch for pandas UDFs.")
    p.add_argument("--work_dir", type=str, default=None,
                   help="Checkpoint root for resumable execution.")
    p.add_argument("--master", type=str, default=None,
                   help="Spark master override (default local[processes]).")
    p.add_argument("-la", "--lazy", type=b, default=None,
                   choices=[True, False], help="(Deprecated)")
    return p


def main(argv: list[str] | None = None) -> int:
    from sparkdedup.config import DedupConfig
    from sparkdedup.session import get_spark

    args = build_parser().parse_args(argv)
    if args.lazy is not None:
        # dif.py:942-944
        raise Exception(
            'Parameter "-la" / "lazy" was renamed to "-dim" / "same_dim" '
            "with difPy v4.2. Please update your script.")
    if args.move_to is not None and args.delete:
        # dif.py:1010-1011
        raise Exception(
            '"move_to" and "delete" parameter are mutually exclusive. '
            "Please select one of them.")

    out_dir = args.output_directory or os.getcwd()
    os.makedirs(out_dir, exist_ok=True)

    cfg = DedupConfig(
        tables=tuple(args.directory),
        recursive=args.recursive,
        in_folder=args.in_folder,
        limit_extensions=args.limit_extensions,
        num_perm=args.px_size,
        shingle_k=args.shingle_k,
        similarity=args.similarity,
        containment=args.rotate,
        same_dim=args.same_dim,
        processes=args.processes,
        chunksize=args.chunksize,
        work_dir=args.work_dir,
    )
    master = args.master or f"local[{args.processes}]"
    extra = {}
    if args.chunksize:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(
            args.chunksize)
    spark = get_spark(master=master, shuffle_partitions=args.processes,
                      extra_conf=extra)

    if cfg.work_dir:
        from sparkdedup.plans.checkpoint import resumable_run
        from sparkdedup.sources.files import read_files
        res, _runner = resumable_run(spark, cfg, read_files(spark, cfg))
    else:
        from sparkdedup.plans.pipeline import run as run_pipeline
        res = run_pipeline(spark, cfg)

    ts = datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S")

    # DataFrame-native sinks (the scale path)
    res.clusters.write.mode("overwrite").parquet(
        os.path.join(out_dir, "clusters"))
    res.ranked.write.mode("overwrite").parquet(
        os.path.join(out_dir, "ranked"))
    res.lower_quality_df.write.mode("overwrite").parquet(
        os.path.join(out_dir, "lower_quality"))
    res.invalid.write.mode("overwrite").parquet(
        os.path.join(out_dir, "invalid"))
    if args.move_to is not None:
        res.actions("move", args.move_to).write.mode("overwrite").parquet(
            os.path.join(out_dir, "actions"))
    elif args.delete:
        res.actions("delete").write.mode("overwrite").parquet(
            os.path.join(out_dir, "actions"))

    # difPy-shaped JSON exports (collect only when small enough)
    stats_file = f"sparkdedup_{ts}_stats.json"
    with open(os.path.join(out_dir, stats_file), "w") as f:
        json.dump(res.stats(), f)
    result_file = f"sparkdedup_{ts}_results.json"
    lq_file = f"sparkdedup_{ts}_lower_quality.txt"
    try:
        result = res.result()
        with open(os.path.join(out_dir, result_file), "w") as f:
            json.dump(result, f)
        lq = [r["path"] for r in res.lower_quality_df.collect()]
        with open(os.path.join(out_dir, lq_file), "w") as f:
            f.write(f"{lq}")
    except ValueError:
        result_file = lq_file = "(too many matches; see parquet tables)"

    print(f"\n{result_file}\n{lq_file}\n{stats_file}\n\n"
          f"saved in '{out_dir}'.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
