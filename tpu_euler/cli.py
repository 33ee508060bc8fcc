"""Command-line driver.

Reference counterpart: SURVEY.md R12 (argparse driver with stage timers).
Usage:  python -m tpu_euler.cli assemble reads.fq -k 31 -o contigs.fa
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time


def _add_assemble(sub):
    p = sub.add_parser("assemble", help="assemble reads into contigs")
    p.add_argument("reads", help="FASTA/FASTQ file (.gz ok)")
    p.add_argument("-k", type=int, default=31, help="k-mer length (odd)")
    p.add_argument("-o", "--out", default="contigs.fa", help="output FASTA")
    p.add_argument("--min-count", type=int, default=1, help="k-mer frequency cutoff")
    p.add_argument("--read-len", type=int, default=0, help="pad/truncate length (0=auto)")
    p.add_argument("--read-batch", type=int, default=8192)
    p.add_argument(
        "--spectrum-capacity",
        type=int,
        default=0,
        help="max distinct canonical k-mers (0 = auto from input size)",
    )
    p.add_argument("--mesh", type=int, default=0, help="devices for distributed count (0=single)")
    p.add_argument("--metrics-json", default="", help="write stage metrics to this path")
    p.add_argument("-v", "--verbose", action="store_true")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu-euler")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_assemble(sub)
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(message)s",
    )

    if args.cmd == "assemble":
        return _run_assemble(args)
    return 2


def _run_assemble(args) -> int:
    from tpu_euler.config import AssemblyConfig
    from tpu_euler.io.fastx import read_fastx, write_fasta
    from tpu_euler.pipeline.assemble import assemble_reads
    from tpu_euler.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    t0 = time.perf_counter()
    reads = [seq for _, seq in read_fastx(args.reads) if len(seq) >= args.k]
    if not reads:
        print(f"no reads of length >= k={args.k} found", file=sys.stderr)
        return 1
    read_len = args.read_len or max(len(r) for r in reads)
    total_bases = sum(len(r) for r in reads)
    cap = args.spectrum_capacity or 1 << max(
        14, (2 * total_bases).bit_length() - 2
    )  # heuristic: distinct kmers <~ total bases; padded, power of two
    cfg = AssemblyConfig(
        k=args.k,
        min_count=args.min_count,
        read_batch=args.read_batch,
        read_len=read_len,
        spectrum_capacity=cap,
        mesh_shape=(args.mesh,) if args.mesh else (),
    )
    t_parse = time.perf_counter() - t0

    result = assemble_reads(reads, cfg)
    contigs = sorted(result.contig_strings, key=len, reverse=True)
    write_fasta(args.out, contigs)

    wall = time.perf_counter() - t0
    metrics = {
        "reads": result.n_reads,
        "bases": total_bases,
        "kmers_counted": result.n_kmers_counted,
        "distinct_kmers": result.n_distinct_kmers,
        "contigs": len(contigs),
        "longest_contig": max((len(c) for c in contigs), default=0),
        "wall_s": round(wall, 3),
        "parse_s": round(t_parse, 3),
        "stages_s": {s: round(v, 3) for s, v in result.stage_seconds.items()},
        "kmers_per_s": round(result.n_kmers_counted / max(wall, 1e-9)),
        "reads_per_s": round(result.n_reads / max(wall, 1e-9)),
    }
    print(json.dumps(metrics))
    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(metrics, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
