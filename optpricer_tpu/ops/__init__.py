# optpricer_tpu.ops — jitted numerical kernels (Black-Scholes closed forms,
# tridiagonal solvers, sufficient-statistics reductions, Pallas TPU kernels).
from . import black_scholes, stats, tridiag  # noqa: F401
