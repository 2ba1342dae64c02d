from pararealml_tpu.ops.fused_diffusion import (
    build_fused_diffusion_rk4_step,
    build_fused_diffusion_rk4_trajectory,
    fused_diffusion_step_applicable,
)

__all__ = [
    "build_fused_diffusion_rk4_step",
    "build_fused_diffusion_rk4_trajectory",
    "fused_diffusion_step_applicable",
]
