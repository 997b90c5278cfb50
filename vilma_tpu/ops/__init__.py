from vilma_tpu.ops.blocks import PackedLD, BlockBucket  # noqa: F401
from vilma_tpu.ops import lowrank  # noqa: F401
