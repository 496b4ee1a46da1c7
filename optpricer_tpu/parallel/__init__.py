# optpricer_tpu.parallel — device-mesh data parallelism (DP over ICI).
from .mesh import get_mesh, mc_sumstats_sharded  # noqa: F401
