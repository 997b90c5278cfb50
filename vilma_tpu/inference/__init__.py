from vilma_tpu.inference.engine import MultiPopVI  # noqa: F401
