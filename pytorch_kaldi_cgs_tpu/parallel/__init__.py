from .mesh import (make_mesh, batch_sharding, replicate_sharding,
                   model_sharding_rules, shard_variables)
from .seqpipe import (seq_parallel, seq_parallel_context, seq_pipeline_scan,
                      pick_microbatches)
from . import multihost
