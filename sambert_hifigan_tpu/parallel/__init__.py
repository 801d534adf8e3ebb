from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, create_mesh, initialize_distributed, replicate, replicated_sharding, shard_batch
from .sharding_rules import shard_tree, tp_sharding_for_leaf, tp_shardings_by_shape
