from .mesh import ENSEMBLE_AXIS, ensemble_mesh, replicate, shard_ensemble
from .distributed import (
    global_ensemble_mesh,
    initialize_distributed,
    is_distributed,
    local_device_count,
    process_count,
)
