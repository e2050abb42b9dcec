from .runner import EnsembleResult, ensemble_run, noise_schedule
