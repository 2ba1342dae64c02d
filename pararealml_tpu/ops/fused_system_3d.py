"""Fused Pallas TPU kernels for 3D Cartesian problems (diffusion,
convection-diffusion, wave, Burgers, Cahn-Hilliard).

Extends the 2D kernel family (:mod:`pararealml_tpu.ops.fused_diffusion`
and :mod:`pararealml_tpu.ops.fused_system`) to three spatial
dimensions: all component volumes stay resident in VMEM across every
RK4 time step, boundary conditions are applied on all six faces with
the generic path's exact semantics (zero stencil halos, Neumann ghost
synthesis per axis, Dirichlet grids; reference halo construction:
/root/reference/pararealml/operators/fdm/numerical_differentiator.py:
1188-1242), and each step's volume set streams to the HBM trajectory
with double-buffered async DMA. TPU tiling only constrains the last
two array dimensions (sublanes x lanes), so the depth axis needs no
padding and axis-0 stencil shifts are plain un-tiled concatenations.

The 3D example problems (e.g. burgers_3d at 21^3, cahn_hilliard_3d at
21^3) sit deep in the launch-latency-bound regime where the generic
per-step XLA dispatch dominates; fusing the whole trajectory into one
kernel removes it entirely, exactly as the 2D kernels do for the
reference's 2D configurations.

Applicability: the exact built-in equation type on a 3D Cartesian mesh
with static boundary conditions, solved with RK4 in float32, small
enough for all volumes and RK4 stages to fit VMEM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import (
    BurgersEquation,
    CahnHilliardEquation,
    ConvectionDiffusionEquation,
    DiffusionEquation,
    WaveEquation,
)
from pararealml_tpu.mesh import CoordinateSystem

_EQUATION_TYPES_3D = (
    DiffusionEquation,
    ConvectionDiffusionEquation,
    WaveEquation,
    BurgersEquation,
    CahnHilliardEquation,
)


def _padded_cells_3d(vertices_shape) -> int:
    depth, height, width = vertices_shape
    return depth * (-(-height // 8) * 8) * (-(-width // 128) * 128)


def _fits_vmem_3d(cp) -> bool:
    # liveness model calibrated on hardware: Mosaic's scoped-stack
    # peak for the 3-component RK4 stage measured ~22 volumes per
    # component (three axes of concatenate temporaries stay live), and
    # the kernel raises the scoped limit to 100 MiB (25M f32)
    n = cp.differential_equation.y_dimension
    return _padded_cells_3d(cp.mesh.vertices_shape) <= 25_000_000 // (
        22 * n + 10
    )


def fused_system_3d_step_applicable(cp, integrator) -> bool:
    """Whether the fused 3D kernel reproduces the generic path for this
    problem."""
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    return (
        not jax.config.read("jax_enable_x64")
        and type(diff_eq) in _EQUATION_TYPES_3D
        and isinstance(integrator, RK4)
        and diff_eq.x_dimension == 3
        and cp.mesh is not None
        and cp.mesh.coordinate_system_type == CoordinateSystem.CARTESIAN
        and cp.are_all_boundary_conditions_static
        and _fits_vmem_3d(cp)
    )


def _component_constraint_tensors_3d(cp: ConstrainedProblem, n: int):
    """Dense static constraint tensors: Dirichlet volumes (n, d, h, w)
    and per-axis Neumann ghost faces (2 faces, n, *other-two-dims)."""
    depth, height, width = cp.mesh.vertices_shape
    dtype = np.float32

    if cp.static_y_vertex_constraints is not None:
        dir_mask = np.asarray(
            cp.static_y_vertex_constraints.mask
        ).reshape(depth, height, width, n)
        dir_vals = np.asarray(
            cp.static_y_vertex_constraints.values
        ).reshape(depth, height, width, n)
        dir_vals = np.where(dir_mask, dir_vals, 0.0)
    else:
        dir_mask = np.zeros((depth, height, width, n), bool)
        dir_vals = np.zeros((depth, height, width, n))

    def face_tensors(pair, face_shape):
        """(2 sides, n, *face_shape) mask and value arrays."""
        masks = np.zeros((2, n) + face_shape, bool)
        values = np.zeros((2, n) + face_shape, dtype)
        for side_index, side in enumerate(
            (pair.lower, pair.upper) if pair else (None, None)
        ):
            if side is None:
                continue
            masks[side_index] = np.moveaxis(
                np.asarray(side.mask).reshape(face_shape + (n,)),
                -1,
                0,
            )
            values[side_index] = np.moveaxis(
                np.asarray(side.values).reshape(face_shape + (n,)),
                -1,
                0,
            ).astype(dtype)
        return masks, values

    d_y = cp.static_boundary_vertex_constraints.d_y
    ghost_0 = face_tensors(d_y[0], (height, width))
    ghost_1 = face_tensors(d_y[1], (depth, width))
    ghost_2 = face_tensors(d_y[2], (depth, height))
    return dict(
        dir_mask=np.moveaxis(dir_mask, -1, 0),
        dir_vals=np.moveaxis(dir_vals.astype(dtype), -1, 0),
        ghost_0_mask=ghost_0[0],
        ghost_0_vals=ghost_0[1],
        ghost_1_mask=ghost_1[0],
        ghost_1_vals=ghost_1[1],
        ghost_2_mask=ghost_2[0],
        ghost_2_vals=ghost_2[1],
    )


class _StencilHelpers3D:
    """Per-stage stencil helpers over an (d, ph, pw) volume with
    per-component boundary data, matching the generic
    ThreePointCentralDifferenceMethod semantics axis by axis."""

    def __init__(self, geometry, faces):
        self._g = geometry
        self._faces = faces

    def _shifted(self, state, axis, offset):
        zero = self._g["zero_planes"][axis]
        index = [slice(None)] * 3
        if offset < 0:
            index[axis] = slice(0, state.shape[axis] - 1)
            return jnp.concatenate(
                [zero, state[tuple(index)]], axis=axis
            )
        index[axis] = slice(1, None)
        return jnp.concatenate(
            [state[tuple(index)], zero], axis=axis
        )

    def laplacian(self, comp, state):
        g = self._g
        dims = (g["depth"], g["height"], g["width"])
        lap = None
        for axis in range(3):
            lower = self._shifted(state, axis, -1)
            upper = self._shifted(state, axis, 1)
            term = (lower - 2.0 * state + upper) * g["inv_dx_sqr"][axis]
            lap = term if lap is None else lap + term

        # Neumann ghost contributions on each axis's two faces:
        # ghost = inner-neighbor -/+ 2 dx * constrained derivative.
        # Face masks are f32 0/1 blended arithmetically — Mosaic cannot
        # insert a minor dimension into an i1 vector (the axis-2
        # expand_dims), and multiplies sidestep the relayout entirely.
        for axis in range(3):
            size = dims[axis]
            mask = self._faces[f"ghost_{axis}_mask"]
            vals = self._faces[f"ghost_{axis}_vals"]
            inner_low = jax.lax.index_in_dim(
                state, 1, axis=axis, keepdims=True
            )
            inner_high = jax.lax.index_in_dim(
                state, size - 2, axis=axis, keepdims=True
            )
            ghost_low = jnp.expand_dims(mask[0, comp], axis) * (
                inner_low
                - g["two_dx"][axis]
                * jnp.expand_dims(vals[0, comp], axis)
            )
            ghost_high = jnp.expand_dims(mask[1, comp], axis) * (
                inner_high
                + g["two_dx"][axis]
                * jnp.expand_dims(vals[1, comp], axis)
            )
            first = jax.lax.slice_in_dim(lap, 0, 1, axis=axis)
            middle = jax.lax.slice_in_dim(lap, 1, size - 1, axis=axis)
            last = jax.lax.slice_in_dim(lap, size - 1, size, axis=axis)
            parts = [
                first + ghost_low * g["inv_dx_sqr"][axis],
                middle,
                last + ghost_high * g["inv_dx_sqr"][axis],
            ]
            pad = g["axis_pads"][axis]
            if pad is not None:
                parts.append(pad)
            lap = jnp.concatenate(parts, axis=axis)
        return lap

    def gradient(self, axis, comp, state):
        """Central derivative along ``axis`` with zero halos, boundary
        faces replaced by the constrained normal derivative where
        masked."""
        g = self._g
        dims = (g["depth"], g["height"], g["width"])
        size = dims[axis]
        lower = self._shifted(state, axis, -1)
        upper = self._shifted(state, axis, 1)
        gradient = (upper - lower) * g["inv_two_dx"][axis]

        mask = self._faces[f"ghost_{axis}_mask"]
        vals = self._faces[f"ghost_{axis}_vals"]
        mask_low = jnp.expand_dims(mask[0, comp], axis)
        mask_high = jnp.expand_dims(mask[1, comp], axis)
        first = mask_low * jnp.expand_dims(vals[0, comp], axis) + (
            1.0 - mask_low
        ) * jax.lax.slice_in_dim(gradient, 0, 1, axis=axis)
        last = mask_high * jnp.expand_dims(vals[1, comp], axis) + (
            1.0 - mask_high
        ) * jax.lax.slice_in_dim(gradient, size - 1, size, axis=axis)
        parts = [
            first,
            jax.lax.slice_in_dim(gradient, 1, size - 1, axis=axis),
            last,
        ]
        pad = g["axis_pads"][axis]
        if pad is not None:
            parts.append(pad)
        return jnp.concatenate(parts, axis=axis)

    # the 2D step-factory interface, mapped onto the 3D axes so the
    # RHS builders below read naturally
    def gradient_0(self, comp, state):
        return self.gradient(0, comp, state)

    def gradient_1(self, comp, state):
        return self.gradient(1, comp, state)

    def gradient_2(self, comp, state):
        return self.gradient(2, comp, state)


def _make_rhs_builder_3d(diff_eq):
    """The per-equation RHS over the 3D stencil helpers."""
    if isinstance(diff_eq, ConvectionDiffusionEquation):
        d = float(diff_eq._d)
        velocity = tuple(float(v) for v in diff_eq._velocity)

        def rhs(helpers, y):
            plane = y[0]
            result = d * helpers.laplacian(0, plane)
            for axis, v in enumerate(velocity):
                if v != 0.0:
                    result = result - v * helpers.gradient(
                        axis, 0, plane
                    )
            return (result,)

        return rhs

    if isinstance(diff_eq, DiffusionEquation):
        d = float(diff_eq._d)

        def rhs(helpers, y):
            return (d * helpers.laplacian(0, y[0]),)

        return rhs

    if isinstance(diff_eq, WaveEquation):
        c_sqr = float(diff_eq._c) ** 2

        def rhs(helpers, y):
            return (y[1], c_sqr * helpers.laplacian(0, y[0]))

        return rhs

    assert isinstance(diff_eq, BurgersEquation)
    viscosity = 1.0 / float(diff_eq._re)

    def rhs(helpers, y):
        return tuple(
            viscosity * helpers.laplacian(comp, plane)
            - y[0] * helpers.gradient(0, comp, plane)
            - y[1] * helpers.gradient(1, comp, plane)
            - y[2] * helpers.gradient(2, comp, plane)
            for comp, plane in enumerate(y)
        )

    return rhs


def _make_step_factory_3d(diff_eq, d_t):
    """``factory(helpers, apply_dirichlet, dirichlet_component) ->
    step(y) -> y_next`` over the component-volume tuple."""
    if isinstance(diff_eq, CahnHilliardEquation):
        d = float(diff_eq._d)
        gamma = float(diff_eq._gamma)

        def factory(helpers, apply_dirichlet, dirichlet_component):
            def step(y):
                y0, y1 = y
                # mixed LHS, matching the 2D kernel and fdm_operator:
                # RK4 on y0' = d lap(y1) with y1 constant through the
                # stages (so k2 = k3 = k4), then algebraic y1 from the
                # step-initial y0
                k1 = d * helpers.laplacian(1, y1)
                k_rest = d * helpers.laplacian(
                    1, dirichlet_component(1, y1)
                )
                y0_next = dirichlet_component(
                    0, y0 + (d_t / 6.0) * (k1 + 5.0 * k_rest)
                )
                y1_next = dirichlet_component(
                    1,
                    y0**3 - y0 - gamma * helpers.laplacian(0, y0),
                )
                return (y0_next, y1_next)

            return step

        return factory

    rhs_builder = _make_rhs_builder_3d(diff_eq)

    def factory(helpers, apply_dirichlet, dirichlet_component):
        def rhs(y):
            return rhs_builder(helpers, y)

        def axpy(y, k, scale):
            return tuple(
                plane + scale * k_plane
                for plane, k_plane in zip(y, k)
            )

        def step(y):
            k1 = rhs(y)
            k2 = rhs(apply_dirichlet(axpy(y, k1, 0.5 * d_t)))
            k3 = rhs(apply_dirichlet(axpy(y, k2, 0.5 * d_t)))
            k4 = rhs(apply_dirichlet(axpy(y, k3, d_t)))
            combined = tuple(
                k1_p + 2.0 * k2_p + 2.0 * k3_p + k4_p
                for k1_p, k2_p, k3_p, k4_p in zip(k1, k2, k3, k4)
            )
            return apply_dirichlet(axpy(y, combined, d_t / 6.0))

        return step

    return factory


class _SystemKernelConfig3D:
    """Shared static configuration for the 3D system kernels: volume
    geometry, padded constant tensors, and the step factory both the
    trajectory and the end-only kernel body call with the constant
    values read from their refs."""

    def __init__(self, cp: ConstrainedProblem, d_t):
        diff_eq = cp.differential_equation
        if type(diff_eq) not in _EQUATION_TYPES_3D:
            raise ValueError(
                f"no fused 3D kernel for {type(diff_eq).__name__}"
            )
        self.n = n = diff_eq.y_dimension
        mesh = cp.mesh
        self.depth, self.height, self.width = depth, height, width = (
            mesh.vertices_shape
        )
        d_x = tuple(float(v) for v in mesh.d_x)
        constants = _component_constraint_tensors_3d(cp, n)
        self.step_factory = _make_step_factory_3d(diff_eq, d_t)
        self.dtype = dtype = jnp.float32

        self.padded_height = padded_height = -(-height // 8) * 8
        self.padded_width = padded_width = -(-width // 128) * 128

        self.geometry_static = dict(
            depth=depth,
            height=height,
            width=width,
            inv_dx_sqr=tuple(1.0 / v**2 for v in d_x),
            inv_two_dx=tuple(1.0 / (2.0 * v) for v in d_x),
            two_dx=tuple(2.0 * v for v in d_x),
        )

        def pad_volumes(array, value_dtype=None):
            return jnp.pad(
                jnp.asarray(array, value_dtype),
                (
                    (0, 0),
                    (0, 0),
                    (0, padded_height - height),
                    (0, padded_width - width),
                ),
            )

        def pad_last(array, pad, value_dtype=None):
            return jnp.pad(
                jnp.asarray(array, value_dtype),
                ((0, 0), (0, 0), (0, 0), (0, pad)),
            )

        self.pad_volumes = pad_volumes
        self.padded_constants = (
            pad_volumes(constants["dir_mask"]),
            pad_volumes(constants["dir_vals"], dtype),
            # axis-0 faces are (2, n, h, w): pad both tiled dims. Masks
            # travel as f32 0/1 (see _StencilHelpers3D.laplacian).
            jnp.pad(
                jnp.asarray(constants["ghost_0_mask"], dtype),
                (
                    (0, 0),
                    (0, 0),
                    (0, padded_height - height),
                    (0, padded_width - width),
                ),
            ),
            jnp.pad(
                jnp.asarray(constants["ghost_0_vals"], dtype),
                (
                    (0, 0),
                    (0, 0),
                    (0, padded_height - height),
                    (0, padded_width - width),
                ),
            ),
            # axis-1 faces are (2, n, d, w): pad lanes only
            pad_last(
                constants["ghost_1_mask"], padded_width - width, dtype
            ),
            pad_last(
                constants["ghost_1_vals"], padded_width - width, dtype
            ),
            # axis-2 faces are (2, n, d, h): pad the h (lane) dim
            pad_last(
                constants["ghost_2_mask"], padded_height - height, dtype
            ),
            pad_last(
                constants["ghost_2_vals"], padded_height - height, dtype
            ),
        )

    def make_step(
        self,
        dir_mask,
        dir_vals,
        ghost_0_mask,
        ghost_0_vals,
        ghost_1_mask,
        ghost_1_vals,
        ghost_2_mask,
        ghost_2_vals,
    ):
        """Builds the per-step function from the constant values (read
        from kernel refs)."""
        dtype = self.dtype
        depth = self.depth
        height, width = self.height, self.width
        padded_height, padded_width = (
            self.padded_height,
            self.padded_width,
        )
        geometry = dict(
            self.geometry_static,
            zero_planes=(
                jnp.zeros((1, padded_height, padded_width), dtype),
                jnp.zeros((depth, 1, padded_width), dtype),
                jnp.zeros((depth, padded_height, 1), dtype),
            ),
            axis_pads=(
                None,
                (
                    jnp.zeros(
                        (
                            depth,
                            padded_height - height,
                            padded_width,
                        ),
                        dtype,
                    )
                    if padded_height > height
                    else None
                ),
                (
                    jnp.zeros(
                        (depth, padded_height, padded_width - width),
                        dtype,
                    )
                    if padded_width > width
                    else None
                ),
            ),
        )
        faces = dict(
            ghost_0_mask=ghost_0_mask,
            ghost_0_vals=ghost_0_vals,
            ghost_1_mask=ghost_1_mask,
            ghost_1_vals=ghost_1_vals,
            ghost_2_mask=ghost_2_mask,
            ghost_2_vals=ghost_2_vals,
        )
        helpers = _StencilHelpers3D(geometry, faces)

        def dirichlet_component(comp, volume):
            return jnp.where(dir_mask[comp], dir_vals[comp], volume)

        def apply_dirichlet(y):
            return tuple(
                dirichlet_component(comp, volume)
                for comp, volume in enumerate(y)
            )

        return self.step_factory(
            helpers, apply_dirichlet, dirichlet_component
        )


def build_fused_system_3d_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
    _vmem_output: bool = False,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    steps of a 3D problem, ``y`` of shape (d, h, w, n).

    ``_vmem_output`` is a hardware bring-up aid: the trajectory is
    written to a VMEM output with plain stores instead of async DMA to
    HBM, isolating the compute path from the DMA pipeline (only viable
    for small ``n_steps`` since the whole trajectory must fit VMEM)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = _SystemKernelConfig3D(cp, d_t)
    n = cfg.n
    depth, height, width = cfg.depth, cfg.height, cfg.width
    dtype = cfg.dtype
    padded_height = cfg.padded_height
    padded_width = cfg.padded_width

    def make_step(*const_refs):
        return cfg.make_step(*(ref[:] for ref in const_refs))

    def kernel(
        y_ref,  # (n, d, ph, pw)
        dir_mask_ref,
        dir_vals_ref,
        ghost_0_mask_ref,
        ghost_0_vals_ref,
        ghost_1_mask_ref,
        ghost_1_vals_ref,
        ghost_2_mask_ref,
        ghost_2_vals_ref,
        traj_ref,  # (n_steps * n, d, ph, pw) in HBM, k-major
        scratch_ref,  # (2 * n, d, ph, pw) VMEM, slot-major
        copy_sems,  # (2 * n,)
    ):
        step = make_step(
            dir_mask_ref,
            dir_vals_ref,
            ghost_0_mask_ref,
            ghost_0_vals_ref,
            ghost_1_mask_ref,
            ghost_1_vals_ref,
            ghost_2_mask_ref,
            ghost_2_vals_ref,
        )

        # per-component (d, ph, pw) slab copies between rank-4
        # single-indexed refs — the exact ref/DMA structure the 2D
        # kernels run in production (rank-5 double-indexed refs hung
        # on hardware)
        def traj_copy(slot, comp, k):
            return pltpu.make_async_copy(
                scratch_ref.at[slot * n + comp],
                traj_ref.at[k * n + comp],
                copy_sems.at[slot * n + comp],
            )

        def body(k, carry):
            y = step(carry)
            slot = jax.lax.rem(k, 2)

            @pl.when(k >= 2)
            def _():
                for comp in range(n):
                    traj_copy(slot, comp, k - 2).wait()

            for comp, volume in enumerate(y):
                scratch_ref[slot * n + comp] = volume
            for comp in range(n):
                traj_copy(slot, comp, k).start()
            return y

        jax.lax.fori_loop(
            0,
            n_steps,
            body,
            tuple(y_ref[comp] for comp in range(n)),
        )

        @pl.when(n_steps >= 2)
        def _():
            slot = jax.lax.rem(n_steps - 2, 2)
            for comp in range(n):
                traj_copy(slot, comp, n_steps - 2).wait()

        @pl.when(n_steps >= 1)
        def _():
            slot = jax.lax.rem(n_steps - 1, 2)
            for comp in range(n):
                traj_copy(slot, comp, n_steps - 1).wait()

    def debug_kernel(
        y_ref,
        dir_mask_ref,
        dir_vals_ref,
        ghost_0_mask_ref,
        ghost_0_vals_ref,
        ghost_1_mask_ref,
        ghost_1_vals_ref,
        ghost_2_mask_ref,
        ghost_2_vals_ref,
        traj_ref,  # (n_steps, n, d, ph, pw) VMEM — plain stores
    ):
        step = make_step(
            dir_mask_ref,
            dir_vals_ref,
            ghost_0_mask_ref,
            ghost_0_vals_ref,
            ghost_1_mask_ref,
            ghost_1_vals_ref,
            ghost_2_mask_ref,
            ghost_2_vals_ref,
        )

        def body(k, carry):
            y = step(carry)
            for comp, volume in enumerate(y):
                traj_ref[k, comp] = volume
            return y

        jax.lax.fori_loop(
            0,
            n_steps,
            body,
            tuple(y_ref[comp] for comp in range(n)),
        )

    # multi-component 3D stages exceed Mosaic's default 16 MiB scoped
    # VMEM stack (three axes of concatenate temporaries stay live per
    # RK4 stage); v5e has 128 MiB of physical VMEM, so raise the limit
    # rather than shrinking the applicability gate
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )
    if _vmem_output:
        call = pl.pallas_call(
            debug_kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps, n, depth, padded_height, padded_width),
                dtype,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=compiler_params,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps * n, depth, padded_height, padded_width),
                dtype,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM(
                    (2 * n, depth, padded_height, padded_width),
                    dtype,
                ),
                pltpu.SemaphoreType.DMA((2 * n,)),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )

    def trajectory(y: jax.Array) -> jax.Array:
        volumes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(depth, height, width, n),
            -1,
            0,
        )
        y_padded = cfg.pad_volumes(volumes)
        out = call(y_padded, *cfg.padded_constants)
        if not _vmem_output:
            out = out.reshape(
                (n_steps, n, depth, padded_height, padded_width)
            )
        # transpose first, slice last so the slice fuses into the
        # consumer (see tiled_diffusion.trajectory)
        out = jnp.moveaxis(out, 1, -1)
        return out[:, :, :height, :width].astype(y.dtype)

    return trajectory


def build_fused_system_3d_rk4_end(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
    batch: Optional[int] = None,
):
    """Builds ``end(y) -> y_final`` advancing ``n_steps`` fused 3D RK4
    steps and returning ONLY the final state, or ``None`` when the
    volume exceeds the VMEM liveness model.

    No trajectory is written to HBM — the state stays in VMEM for the
    whole solve (see
    :func:`pararealml_tpu.ops.fused_diffusion.
    build_fused_diffusion_rk4_end`). With ``batch=B``, ``end`` maps
    ``(B, ...) -> (B, ...)`` via a Pallas grid over the batch. The
    batched input flattens the batch into the leading component axis
    (``(B * n, d, ph, pw)``) so every ref stays rank-4 single-indexed —
    rank-5 refs hung Mosaic on hardware (see the trajectory kernel's
    DMA notes).
    """
    from jax.experimental.pallas import tpu as pltpu

    if not _fits_vmem_3d(cp):
        return None
    cfg = _SystemKernelConfig3D(cp, d_t)
    n = cfg.n
    depth, height, width = cfg.depth, cfg.height, cfg.width
    dtype = cfg.dtype
    padded_height = cfg.padded_height
    padded_width = cfg.padded_width

    batched = batch is not None

    def kernel(
        y_ref,  # (n, d, ph, pw) — one slice's volumes
        dir_mask_ref,
        dir_vals_ref,
        ghost_0_mask_ref,
        ghost_0_vals_ref,
        ghost_1_mask_ref,
        ghost_1_vals_ref,
        ghost_2_mask_ref,
        ghost_2_vals_ref,
        out_ref,  # (n, d, ph, pw)
    ):
        step = cfg.make_step(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_0_mask_ref[:],
            ghost_0_vals_ref[:],
            ghost_1_mask_ref[:],
            ghost_1_vals_ref[:],
            ghost_2_mask_ref[:],
            ghost_2_vals_ref[:],
        )
        final = jax.lax.fori_loop(
            0,
            n_steps,
            lambda k, carry: step(carry),
            tuple(y_ref[comp] for comp in range(n)),
        )
        for comp, volume in enumerate(final):
            out_ref[comp] = volume

    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )
    if batched:
        grid_block = pl.BlockSpec(
            (n, depth, padded_height, padded_width),
            lambda b: (b, 0, 0, 0),
        )

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda b: (0,) * len(shape))

        call = pl.pallas_call(
            kernel,
            grid=(batch,),
            out_shape=jax.ShapeDtypeStruct(
                (batch * n, depth, padded_height, padded_width), dtype
            ),
            in_specs=[grid_block]
            + [
                const_spec(np.asarray(c).shape)
                for c in cfg.padded_constants
            ],
            out_specs=grid_block,
            compiler_params=compiler_params,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n, depth, padded_height, padded_width), dtype
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=compiler_params,
            interpret=interpret,
        )

    def end(y: jax.Array) -> jax.Array:
        if batched:
            volumes = jnp.moveaxis(
                jnp.asarray(y, dtype).reshape(
                    -1, depth, height, width, n
                ),
                -1,
                1,
            ).reshape(-1, depth, height, width)
            y_padded = cfg.pad_volumes(volumes)
            out = call(y_padded, *cfg.padded_constants)
            out = jnp.moveaxis(
                out.reshape(
                    -1, n, depth, padded_height, padded_width
                ),
                1,
                -1,
            )[:, :, :height, :width]
            return out.reshape((-1,) + tuple(y.shape[1:])).astype(
                y.dtype
            )
        volumes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(depth, height, width, n),
            -1,
            0,
        )
        y_padded = cfg.pad_volumes(volumes)
        out = call(y_padded, *cfg.padded_constants)
        out = jnp.moveaxis(out, 0, -1)[:, :height, :width]
        return out.reshape(y.shape).astype(y.dtype)

    return end


def build_fused_system_3d_rk4_step(
    cp: ConstrainedProblem, d_t: float, interpret: bool = False
):
    """One fused 3D RK4 step (the single-step specialization)."""
    trajectory = build_fused_system_3d_rk4_trajectory(
        cp, d_t, 1, interpret=interpret
    )

    def step(y):
        return trajectory(y)[0]

    return step
