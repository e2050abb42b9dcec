from .checkpoint import BestCheckpoint, KeyedArchive, load_pytree, save_pytree
