from tpuclip.utils.logging import log, safe_print_path  # noqa: F401
from tpuclip.utils.profiling import StepTimers, Timings  # noqa: F401
