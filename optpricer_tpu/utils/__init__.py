# optpricer_tpu.utils — timing/profiling helpers.
from .timing import Timer, benchmark  # noqa: F401
