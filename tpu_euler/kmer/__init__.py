from tpu_euler.kmer import keys  # noqa: F401
