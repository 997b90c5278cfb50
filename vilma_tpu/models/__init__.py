from vilma_tpu.models import sigma, mixture  # noqa: F401
