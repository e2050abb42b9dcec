from .pallas_stencil import (fused_updet_rhs, fused_updet_rhs_diff,
                             fused_updet_rhs_gridded,
                             make_pointwise_mlp_params, updet_rhs_xla)
