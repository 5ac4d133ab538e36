from .distributed import initialize_distributed, is_main_process  # noqa: F401
from .mesh import create_mesh, shard_batch, replicate, prefetch_to_mesh  # noqa: F401
