from .layers import (
    MLP,
    Chain,
    Dense,
    FourierBasis,
    StencilConv1D,
    TensorLayer,
    gaussian_rbf,
    rbf,
)
