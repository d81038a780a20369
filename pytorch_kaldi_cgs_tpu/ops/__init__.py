from .block_sparse import (BlockLayout, pack_layout, pack_blocks,
                           unpack_blocks, block_sparse_matmul,
                           block_sparse_matmul_xla)
from .frontend import Frontend, add_deltas_jax, cmvn_jax
