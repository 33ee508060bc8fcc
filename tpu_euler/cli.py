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
    p.add_argument("--tip-rounds", type=int, default=0, help="tip-clipping rounds (0=off)")
    p.add_argument("--tip-len", type=int, default=0, help="tip threshold in edges (0=2k)")
    p.add_argument(
        "--bubble-rounds", type=int, default=0, help="simple-bubble popping rounds (0=off)"
    )
    p.add_argument(
        "--bubble-len", type=int, default=0, help="bubble branch threshold in edges (0=2k)"
    )
    p.add_argument(
        "--min-qual",
        type=int,
        default=0,
        help="mask FASTQ bases below this phred quality as N (0 = off)",
    )
    p.add_argument("--read-len", type=int, default=0, help="pad/truncate length (0=auto)")
    p.add_argument("--read-batch", type=int, default=8192)
    p.add_argument(
        "--spectrum-capacity",
        type=int,
        default=0,
        help="max distinct canonical k-mers (0 = auto from input size)",
    )
    p.add_argument("--mesh", type=int, default=0, help="devices for distributed count (0=single)")
    p.add_argument(
        "--file-shard",
        default="",
        help="I/N: parse only byte-range shard I of N of the input "
        "(per-host data-parallel reads, SURVEY.md D2 — each host touches "
        "~1/N of the file)",
    )
    p.add_argument(
        "--shard-traversal",
        action="store_true",
        help="keep graph+traversal sharded across the mesh (configs 4-5 scale)",
    )
    p.add_argument("--metrics-json", default="", help="write stage metrics to this path")
    p.add_argument(
        "--save-spectrum", default="", help="checkpoint counted k-mer spectrum (.npz)"
    )
    p.add_argument(
        "--resume-spectrum",
        default="",
        help="resume from a spectrum checkpoint (skips read counting)",
    )
    p.add_argument(
        "--save-graph", default="", help="checkpoint graph + unitig chains (.npz)"
    )
    p.add_argument(
        "--resume-graph",
        default="",
        help="resume from a graph checkpoint (skips counting AND graph/traversal)",
    )
    p.add_argument("--profile", default="", help="dump a jax profiler trace to this dir")
    p.add_argument("-v", "--verbose", action="store_true")


def _add_tour(sub):
    p = sub.add_parser(
        "tour",
        help="compute an Eulerian tour / path cover of the de Bruijn graph "
        "(GPU-Euler R7-R9 machinery) and report circuit statistics",
    )
    p.add_argument("reads", help="FASTA/FASTQ file (.gz ok)")
    p.add_argument("-k", type=int, default=31)
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("-o", "--out", default="", help="write tour walks as FASTA")
    p.add_argument("-v", "--verbose", action="store_true")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu-euler")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_assemble(sub)
    _add_tour(sub)
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(message)s",
    )

    if args.cmd == "assemble":
        return _run_assemble(args)
    if args.cmd == "tour":
        return _run_tour(args)
    return 2


def _run_tour(args) -> int:
    import numpy as np

    from tpu_euler.config import AssemblyConfig
    from tpu_euler.euler.tour import eulerian_tour
    from tpu_euler.io.encode import encode_reads
    from tpu_euler.io.fastx import read_fastx, write_fasta
    from tpu_euler.kmer.count import apply_cutoff
    from tpu_euler.pipeline.assemble import count_spectrum
    from tpu_euler.graph.build import build_graph
    from tpu_euler.utils.runtime import setup_compilation_cache

    setup_compilation_cache()
    try:
        reads = [seq for _, seq in read_fastx(args.reads) if len(seq) >= args.k]
    except FileNotFoundError as e:
        print(f"error: cannot read input: {e}", file=sys.stderr)
        return 1
    if not reads:
        print(f"no reads of length >= k={args.k} found", file=sys.stderr)
        return 1
    read_len = max(len(r) for r in reads)
    total_bases = sum(len(r) for r in reads)
    cap = 1 << max(14, (2 * total_bases).bit_length() - 2)
    cfg = AssemblyConfig(
        k=args.k, min_count=args.min_count, read_len=read_len, spectrum_capacity=cap
    )
    t0 = time.perf_counter()
    acc, _ = count_spectrum(encode_reads(reads, read_len), cfg)
    g = build_graph(apply_cutoff(acc, cfg.min_count), cfg.k)
    tour = eulerian_tour(g)

    valid = np.asarray(tour.in_tour)
    chain = np.asarray(tour.chain)[valid]
    pos = np.asarray(tour.pos)[valid]
    length = np.asarray(tour.length)[valid]
    uchain, inv = np.unique(chain, return_inverse=True)
    chain_lens = np.zeros(uchain.size, dtype=np.int64)
    np.maximum.at(chain_lens, inv, length)
    # every edge used exactly once <=> (chain, pos) pairs are all distinct
    every_edge_once = (
        np.unique(np.stack([chain, pos], axis=1), axis=0).shape[0]
        == int(valid.sum())
    )
    metrics = {
        "edges": int(valid.sum()),
        "nodes": int(g.n_nodes),
        "chains": int(tour.n_chains),
        "longest_chain_edges": int(chain_lens.max(initial=0)),
        "every_edge_once": bool(every_edge_once),
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(metrics))

    if args.out:
        from tpu_euler.euler.extract import decode_bases_np

        limbs = np.asarray(g.edge_limbs)[valid]
        _b = np.frombuffer(b"ACGT", dtype=np.uint8)
        lastb = _b[(limbs[:, -1] & 3).astype(np.int64)]
        # edges of chain c occupy order[bnd[c]:bnd[c+1]] — no per-chain scans
        order = np.lexsort((pos, chain))
        bnd = np.concatenate([[0], np.cumsum(np.bincount(inv, minlength=uchain.size))])
        prefixes = decode_bases_np(limbs[order[bnd[:-1]]], args.k - 1, args.k)
        walks = [
            prefixes[c].tobytes().decode()
            + lastb[order[bnd[c] : bnd[c + 1]]].tobytes().decode()
            for c in range(uchain.size)
        ]
        walks.sort(key=len, reverse=True)
        write_fasta(args.out, walks, prefix="walk")
    return 0


def _assemble_with_args(args, t0):
    """Parse input, build config, run (resume-aware, optionally distributed)."""
    from tpu_euler.config import AssemblyConfig
    from tpu_euler.io.encode import encode_reads
    from tpu_euler.io.fastx import read_fastx
    from tpu_euler.pipeline.assemble import (
        AssemblyResult,
        count_spectrum,
        spectrum_to_contigs,
    )
    from tpu_euler.pipeline.checkpoint import load_spectrum, save_spectrum

    # Parse/validate --file-shard FIRST: an invalid spec must exit 1 even when
    # a checkpoint branch would otherwise return early, and combining the two
    # is an error (the checkpoint already fixes which reads were counted).
    file_shard = None
    if args.file_shard:
        try:
            i, n = args.file_shard.split("/")
            file_shard = (int(i), int(n))
            assert 0 <= file_shard[0] < file_shard[1]
        except (ValueError, AssertionError):
            print(f"bad --file-shard {args.file_shard!r}: want I/N with 0<=I<N",
                  file=sys.stderr)
            return None, 0.0
        if args.resume_spectrum or args.resume_graph:
            print("--file-shard cannot be combined with --resume-spectrum/"
                  "--resume-graph (the checkpoint already fixes the input)",
                  file=sys.stderr)
            return None, 0.0

    if args.resume_graph:
        from tpu_euler.euler.extract import chains_to_contigs_device
        from tpu_euler.pipeline.checkpoint import load_graph

        g, chains, k = load_graph(args.resume_graph)
        if k != args.k:
            print(f"checkpoint is k={k}, requested k={args.k}", file=sys.stderr)
            return None, 0.0
        t = {}
        t3 = time.perf_counter()
        contigs = chains_to_contigs_device(g, chains, k)
        t["extract"] = time.perf_counter() - t3
        result = AssemblyResult(
            contigs=contigs,
            n_distinct_kmers=int(g.n_edges) // 2,
            n_kmers_counted=0,
            n_reads=0,
            stage_seconds=t,
        )
        return result, time.perf_counter() - t0

    if args.resume_spectrum:
        spec, k = load_spectrum(args.resume_spectrum)
        if k != args.k:
            print(f"checkpoint is k={k}, requested k={args.k}", file=sys.stderr)
            return None, 0.0
        cfg = AssemblyConfig(
            k=args.k,
            min_count=args.min_count,
            read_len=max(args.read_len, args.k),
            spectrum_capacity=spec.limbs.shape[0],
            tip_rounds=args.tip_rounds,
            tip_len=args.tip_len,
            bubble_rounds=args.bubble_rounds,
            bubble_len=args.bubble_len,
        )
        t: dict = {}
        # fetch BEFORE spectrum_to_contigs: it donates the spectrum's buffers
        n_counted = int(spec.counts.sum())
        holder = [spec]
        del spec
        contigs, n_cut = spectrum_to_contigs(holder, cfg, t)
        result = AssemblyResult(
            contigs=contigs,
            n_distinct_kmers=n_cut,
            n_kmers_counted=n_counted,
            n_reads=0,
            stage_seconds=t,
        )
        return result, time.perf_counter() - t0

    # Fast path: native C++ parse+encode straight into the code matrix.
    from tpu_euler.io.native import encode_file_native, encode_file_shard_native

    if file_shard is not None:
        codes = encode_file_shard_native(
            args.reads,
            file_shard[0],
            file_shard[1],
            read_len=args.read_len,
            min_qual=args.min_qual,
            min_len_keep=args.k,
        )
    else:
        codes = encode_file_native(
            args.reads,
            read_len=args.read_len,
            min_qual=args.min_qual,
            min_len_keep=args.k,
        )
    if codes is not None:
        if codes.shape[0] == 0:
            print(f"no reads of length >= k={args.k} found", file=sys.stderr)
            return None, 0.0
        total_bases = int((codes != 4).sum())
        cap = args.spectrum_capacity or 1 << max(
            14, (2 * total_bases).bit_length() - 2
        )
        cfg = AssemblyConfig(
            k=args.k,
            min_count=args.min_count,
            read_batch=args.read_batch,
            read_len=codes.shape[1],
            spectrum_capacity=cap,
            tip_rounds=args.tip_rounds,
            tip_len=args.tip_len,
            bubble_rounds=args.bubble_rounds,
            bubble_len=args.bubble_len,
        )
        t_parse = time.perf_counter() - t0
        if args.mesh:
            from tpu_euler.dist.pipeline import assemble_reads_distributed

            result = assemble_reads_distributed(
                None,
                cfg,
                n_devices=args.mesh,
                shard_traversal=args.shard_traversal,
                codes=codes,
            )
            return result, t_parse
        t = {}
        acc, n_windows = count_spectrum(codes, cfg, t)
        if args.save_spectrum:
            save_spectrum(args.save_spectrum, acc, cfg.k)
        holder = [acc]
        del acc
        contigs, n_cut = spectrum_to_contigs(holder, cfg, t, save_graph_path=args.save_graph)
        result = AssemblyResult(
            contigs=contigs,
            n_distinct_kmers=n_cut,
            n_kmers_counted=n_windows,
            n_reads=codes.shape[0],
            stage_seconds=t,
        )
        return result, t_parse

    quals = None
    stem = args.reads[:-3] if args.reads.endswith(".gz") else args.reads
    if args.min_qual > 0 and stem.endswith((".fq", ".fastq")):
        from tpu_euler.io.fastx import read_fastq_with_qual, read_shard_with_qual

        if file_shard is not None:
            # Byte-range sharding (striding only for .gz, decided by file type
            # alone) — the SAME strategy as the native codec, so mixed
            # native/Python hosts still partition the file exactly.
            rec_iter = read_shard_with_qual(args.reads, *file_shard)
        else:
            rec_iter = read_fastq_with_qual(args.reads)
        recs = [(s, q) for _, s, q in rec_iter if len(s) >= args.k]
        reads = [s for s, _ in recs]
        quals = [q for _, q in recs]
    elif file_shard is not None:
        from tpu_euler.io.fastx import read_shard

        reads = [
            seq
            for _, seq in read_shard(args.reads, file_shard[0], file_shard[1])
            if len(seq) >= args.k
        ]
    else:
        reads = [seq for _, seq in read_fastx(args.reads) if len(seq) >= args.k]
    if not reads:
        print(f"no reads of length >= k={args.k} found", file=sys.stderr)
        return None, 0.0
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
        tip_rounds=args.tip_rounds,
        tip_len=args.tip_len,
        bubble_rounds=args.bubble_rounds,
        bubble_len=args.bubble_len,
    )
    t_parse = time.perf_counter() - t0

    if args.mesh:
        from tpu_euler.dist.pipeline import assemble_reads_distributed

        result = assemble_reads_distributed(
            reads, cfg, n_devices=args.mesh, shard_traversal=args.shard_traversal
        )
        return result, t_parse

    t = {}
    if quals is not None:
        from tpu_euler.io.encode import encode_reads_with_qual

        codes = encode_reads_with_qual(reads, quals, cfg.read_len, args.min_qual)
    else:
        codes = encode_reads(reads, cfg.read_len)
    acc, n_windows = count_spectrum(codes, cfg, t)
    if args.save_spectrum:
        save_spectrum(args.save_spectrum, acc, cfg.k)
    holder = [acc]
    del acc
    contigs, n_cut = spectrum_to_contigs(holder, cfg, t, save_graph_path=args.save_graph)
    result = AssemblyResult(
        contigs=contigs,
        n_distinct_kmers=n_cut,
        n_kmers_counted=n_windows,
        n_reads=len(reads),
        stage_seconds=t,
    )
    return result, t_parse


def _run_assemble(args) -> int:
    from tpu_euler.utils.runtime import setup_compilation_cache

    setup_compilation_cache()

    profiler_cm = None
    if args.profile:
        import jax

        profiler_cm = jax.profiler.trace(args.profile)
        profiler_cm.__enter__()

    t0 = time.perf_counter()
    try:
        result, t_parse = _assemble_with_args(args, t0)
    except FileNotFoundError as e:
        print(f"error: cannot read input: {e}", file=sys.stderr)
        return 1
    if result is None:
        return 1
    if profiler_cm is not None:
        profiler_cm.__exit__(None, None, None)
    from tpu_euler.io.fastx import write_fasta

    contigs = sorted(result.contig_strings, key=len, reverse=True)
    write_fasta(args.out, contigs)

    wall = time.perf_counter() - t0
    metrics = {
        "reads": result.n_reads,
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
