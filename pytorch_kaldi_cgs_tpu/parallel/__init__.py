from .mesh import (make_mesh, batch_sharding, replicate_sharding,
                   model_sharding_rules, shard_variables)
from . import multihost
