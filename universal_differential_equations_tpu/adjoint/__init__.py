from .sensitivity import (
    AbstractAdjoint,
    BacksolveAdjoint,
    DiscreteAdjoint,
    ForwardSensitivity,
    InterpolatingAdjoint,
    NoAdjoint,
    QuadratureAdjoint,
)
