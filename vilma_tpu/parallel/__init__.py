from vilma_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_data, shard_state, pad_to_multiple,
)
