from tpu_euler.euler.unitigs import unitig_chains, UnitigChains  # noqa: F401
from tpu_euler.euler.extract import chains_to_contigs  # noqa: F401
