from tpu_euler.reference_impl.oracle import assemble_oracle  # noqa: F401
from tpu_euler.reference_impl.simulate import (  # noqa: F401
    random_genome,
    simulate_reads,
    PHIX174,
)
