from . import climate_datagen, climate_npde, fenep, fisher_kpp, lotka_volterra, seir
from .neural_ode import NeuralODE, neural_ode
