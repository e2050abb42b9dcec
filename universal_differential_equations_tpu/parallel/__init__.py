from .mesh import ENSEMBLE_AXIS, ensemble_mesh, replicate, shard_ensemble
