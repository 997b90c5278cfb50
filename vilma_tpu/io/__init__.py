from vilma_tpu.io import load  # noqa: F401
