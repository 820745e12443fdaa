from .mesh import default_mesh, make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    state_sharding,
    shard_state,
    sharded_init_state,
    swap_index_bits_sharded,
    num_global_qubits,
    count_collectives,
)
