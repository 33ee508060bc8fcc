from tpu_euler.dist.mesh import make_mesh  # noqa: F401
from tpu_euler.dist.count_dist import (  # noqa: F401
    DistSpectrum,
    empty_dist_spectrum,
    make_dist_count_step,
    make_gather_spectrum,
)
