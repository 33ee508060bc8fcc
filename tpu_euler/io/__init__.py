from tpu_euler.io.encode import encode_reads, decode_read  # noqa: F401
from tpu_euler.io.fastx import (  # noqa: F401
    read_fasta,
    read_fastq,
    read_fastx,
    write_fasta,
)
