"""CLI driver tests: flags, checkpoint/resume, distributed mesh (SURVEY.md R12)."""

import json

import pytest

from tpu_euler.cli import main
from tpu_euler.reference_impl.oracle import assemble_oracle
from tpu_euler.reference_impl.simulate import random_genome, simulate_reads
from tpu_euler.verify.compare import canonical_contig_set


@pytest.fixture(scope="module")
def fastq(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genome = random_genome(2500, seed=301)
    reads = simulate_reads(genome, read_len=90, coverage=20, seed=302, circular=True)
    path = d / "reads.fq"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(path), reads, str(d)


def run_cli(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1]) if out else None


def read_contigs(path):
    from tpu_euler.io.fastx import read_fasta

    return [s for _, s in read_fasta(path)]


def test_cli_assemble_matches_oracle(fastq, capsys):
    path, reads, d = fastq
    rc, metrics = run_cli(
        ["assemble", path, "-k", "21", "-o", f"{d}/out.fa", "--read-batch", "256"],
        capsys,
    )
    assert rc == 0
    assert metrics["contigs"] >= 1
    got = canonical_contig_set(read_contigs(f"{d}/out.fa"))
    assert got == assemble_oracle(reads, 21)


def test_cli_save_and_resume_spectrum(fastq, capsys):
    path, reads, d = fastq
    rc, m1 = run_cli(
        [
            "assemble", path, "-k", "21", "-o", f"{d}/a.fa",
            "--read-batch", "256", "--save-spectrum", f"{d}/spec.npz",
        ],
        capsys,
    )
    assert rc == 0
    rc, m2 = run_cli(
        [
            "assemble", path, "-k", "21", "-o", f"{d}/b.fa",
            "--resume-spectrum", f"{d}/spec.npz",
        ],
        capsys,
    )
    assert rc == 0
    assert read_contigs(f"{d}/a.fa") == read_contigs(f"{d}/b.fa")
    assert m2["distinct_kmers"] == m1["distinct_kmers"]


def test_cli_save_and_resume_graph(fastq, capsys):
    path, reads, d = fastq
    rc, m1 = run_cli(
        [
            "assemble", path, "-k", "21", "-o", f"{d}/g1.fa",
            "--read-batch", "256", "--save-graph", f"{d}/graph.npz",
        ],
        capsys,
    )
    assert rc == 0
    rc, m2 = run_cli(
        [
            "assemble", path, "-k", "21", "-o", f"{d}/g2.fa",
            "--resume-graph", f"{d}/graph.npz",
        ],
        capsys,
    )
    assert rc == 0
    assert "graph" not in m2["stages_s"] and "count" not in m2["stages_s"]
    assert read_contigs(f"{d}/g2.fa") == read_contigs(f"{d}/g1.fa")
    # wrong k refuses
    rc, _ = run_cli(
        ["assemble", path, "-k", "31", "-o", f"{d}/g3.fa",
         "--resume-graph", f"{d}/graph.npz"],
        capsys,
    )
    assert rc == 1


def test_cli_resume_wrong_k_fails(fastq, capsys):
    path, reads, d = fastq
    rc, _ = run_cli(
        [
            "assemble", path, "-k", "23", "-o", f"{d}/c.fa",
            "--resume-spectrum", f"{d}/spec.npz",
        ],
        capsys,
    )
    assert rc == 1


def test_cli_mesh_mode(fastq, capsys):
    path, reads, d = fastq
    rc, metrics = run_cli(
        [
            "assemble", path, "-k", "21", "-o", f"{d}/m.fa",
            "--read-batch", "64", "--mesh", "8",
        ],
        capsys,
    )
    assert rc == 0
    got = canonical_contig_set(read_contigs(f"{d}/m.fa"))
    assert got == assemble_oracle(reads, 21)


def test_cli_min_qual_masks_bad_bases(tmp_path, capsys):
    """Low-quality error bases masked as N: assembly matches the clean oracle."""
    genome = random_genome(1200, seed=401)
    reads = simulate_reads(genome, read_len=80, coverage=20, seed=402, circular=True)
    path = tmp_path / "q.fq"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            r = list(r)
            qual = ["I"] * len(r)
            if i % 3 == 0:  # corrupt one base but flag it with low quality
                r[37] = "ACGT"[(("ACGT".index(r[37])) + 1) % 4]
                qual[37] = "#"  # phred 2
            f.write(f"@r{i}\n{''.join(r)}\n+\n{''.join(qual)}\n")
    rc = main(
        [
            "assemble", str(path), "-k", "21", "-o", str(tmp_path / "q.fa"),
            "--read-batch", "256", "--min-qual", "10",
        ]
    )
    capsys.readouterr()
    assert rc == 0
    got = canonical_contig_set(read_contigs(str(tmp_path / "q.fa")))
    assert got == assemble_oracle(reads, 21)


def test_cli_tour(fastq, capsys):
    path, reads, d = fastq
    rc = main(["tour", path, "-k", "21", "-o", f"{d}/walks.fa"])
    out = capsys.readouterr().out.strip().splitlines()
    m = json.loads(out[-1])
    assert rc == 0
    assert m["every_edge_once"]
    assert m["chains"] >= 2  # one per strand at minimum
    walks = read_contigs(f"{d}/walks.fa")
    assert walks and all(len(w) >= 21 for w in walks)


def test_cli_file_shard(fastq, capsys):
    """--file-shard I/N parses only that byte-range slice; shard read counts
    sum to the whole file and 0/1 equals the unsharded run (SURVEY.md D2)."""
    path, reads, d = fastq
    rc, full = run_cli(
        ["assemble", path, "-k", "21", "-o", f"{d}/full.fa",
         "--file-shard", "0/1", "--read-batch", "256"],
        capsys,
    )
    assert rc == 0 and full["reads"] == len(reads)
    n_shard = []
    for s in range(3):
        rc, m = run_cli(
            ["assemble", path, "-k", "21", "-o", f"{d}/s{s}.fa",
             "--file-shard", f"{s}/3", "--read-batch", "256"],
            capsys,
        )
        assert rc == 0
        n_shard.append(m["reads"])
    assert sum(n_shard) == len(reads)
    assert all(n > 0 for n in n_shard)


def test_cli_file_shard_bad_spec(fastq, capsys):
    path, _, d = fastq
    assert main(["assemble", path, "--file-shard", "3/3"]) == 1
    assert main(["assemble", path, "--file-shard", "nope"]) == 1
    # invalid spec must fail even when a resume branch would return early,
    # and combining --file-shard with resume flags is an error outright
    assert main(["assemble", path, "--file-shard", "nope",
                 "--resume-spectrum", f"{d}/none.npz"]) == 1
    assert main(["assemble", path, "--file-shard", "0/2",
                 "--resume-spectrum", f"{d}/none.npz"]) == 1


def test_cli_file_shard_min_qual_byte_range(fastq, capsys):
    """--min-qual + --file-shard still partitions the file exactly (the
    qual-aware Python fallback byte-range-shards like the native codec)."""
    path, reads, d = fastq
    import tpu_euler.io.native as native_mod

    orig = native_mod.encode_file_shard_native
    try:
        # force the Python fallback so the qual-aware span parser is the path
        native_mod.encode_file_shard_native = lambda *a, **k: None
        import tpu_euler.cli as cli_mod
        n_shard = []
        for s in range(2):
            rc, m = run_cli(
                ["assemble", path, "-k", "21", "-o", f"{d}/q{s}.fa",
                 "--file-shard", f"{s}/2", "--min-qual", "2",
                 "--read-batch", "256"],
                capsys,
            )
            assert rc == 0
            n_shard.append(m["reads"])
        assert sum(n_shard) == len(reads) and all(n > 0 for n in n_shard)
    finally:
        native_mod.encode_file_shard_native = orig
