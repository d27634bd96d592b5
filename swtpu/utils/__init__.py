from swtpu.utils.timing import time_kernel  # noqa: F401
