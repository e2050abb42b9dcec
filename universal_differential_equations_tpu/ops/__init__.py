from .pallas_stencil import fused_updet_rhs, make_pointwise_mlp_params, updet_rhs_xla
