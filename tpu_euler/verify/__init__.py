from tpu_euler.verify.compare import canonical_contig_set, contig_sets_equal  # noqa: F401
