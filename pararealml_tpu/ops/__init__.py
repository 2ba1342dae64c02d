from pararealml_tpu.ops.fused_diffusion import (
    build_fused_diffusion_rk4_step,
    build_fused_diffusion_rk4_trajectory,
    fused_diffusion_step_applicable,
)
from pararealml_tpu.ops.fused_wave import (
    build_fused_wave_rk4_step,
    build_fused_wave_rk4_trajectory,
    fused_wave_step_applicable,
)
from pararealml_tpu.ops.tiled_diffusion import (
    build_tiled_diffusion_rk4_trajectory,
)

__all__ = [
    "build_fused_diffusion_rk4_step",
    "build_fused_diffusion_rk4_trajectory",
    "fused_diffusion_step_applicable",
    "build_fused_wave_rk4_step",
    "build_fused_wave_rk4_trajectory",
    "fused_wave_step_applicable",
    "build_tiled_diffusion_rk4_trajectory",
]
