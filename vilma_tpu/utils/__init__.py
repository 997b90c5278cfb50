from vilma_tpu.utils.config import (  # noqa: F401
    epsilon,
    default_dtype,
    enable_x64,
)
