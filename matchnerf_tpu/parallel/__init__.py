from .mesh import (make_mesh, replicate, replicate_tree, shard_batch_dim,
                   shard_rays)
from .distributed import (is_main_process, maybe_initialize, process_count,
                          process_index)
