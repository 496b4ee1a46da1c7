# optpricer_tpu.parallel — device-mesh data parallelism (DP over ICI/DCN).
from .mesh import (get_mesh, get_mesh_multislice, mesh_axes,  # noqa: F401
                   mc_sumstats_sharded)
