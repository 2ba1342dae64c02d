"""Closed-form output-layer refinement for affine DeepONet surrogates.

A DeepONet with a linear branch and a linear combiner is AFFINE in its
branch input (the flattened state): the nonlinearity all lives in the
trunk, which only sees the (fixed) domain coordinates. Training such a
surrogate end-to-end with a first-order optimizer leaves accuracy on
the table — the loss is exactly quadratic in the branch parameters, so
once the trunk features have been learned, the branch has a CLOSED-FORM
ridge solution. This module computes it: freeze the trunk and combiner,
project the targets through the combiner onto the trunk feature basis,
and solve one regularized least-squares problem for the branch weights.

This is the hybrid optimization strategy used by operator-learning
work in the "random feature / extreme learning" family (train or fix
the nonlinear features, solve the last linear map exactly); here it
turns the ~5e-2 slice-jump error floor Adam leaves on the Parareal
coarse surrogate (see bench.py's supervised-ML section) into a
near-interpolating fit, which in turn cuts Parareal's iteration count.

The reference trains its Keras surrogates purely by SGD
(/root/reference/pararealml/operators/ml/supervised/
sklearn_keras_regressor.py); the closed-form branch solve is possible
here because the affine structure is explicit in the Flax module tree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..deeponet import DeepONet, Standardized


def _single_dense(tree: dict, where: str) -> dict:
    """Returns the parameter dict of the single Dense layer in a
    sub-tree, raising if the sub-net is not exactly one Dense (the
    linearity precondition for the closed-form solve)."""
    if set(tree.keys()) != {"Dense_0"}:
        raise ValueError(
            f"the {where} net must be a single linear Dense layer for "
            f"the closed-form branch solve; found parameter groups "
            f"{sorted(tree.keys())}"
        )
    return tree["Dense_0"]


def refine_affine_deeponet_branch(
    module,
    params,
    x: np.ndarray,
    y: np.ndarray,
    n_points: Optional[int] = None,
    l2: float = 1e-8,
    projection_damping: float = 1e-6,
) -> Tuple[dict, float]:
    """Solves the linear branch of an affine DeepONet in closed form.

    :param module: a :class:`DeepONet` with a single-Dense (linear)
        branch and combiner, optionally wrapped in
        :class:`Standardized`
    :param params: the module's current (e.g. Adam-trained) parameters;
        trunk and combiner are kept, the branch Dense is replaced
    :param x: training inputs, rows ``[state, trunk features]`` grouped
        by state — every state's rows must share the same ordered set
        of trunk rows (the layout ``SupervisedMLOperator.generate_data``
        produces)
    :param y: training targets, aligned with ``x``
    :param n_points: rows per state; inferred from the first repeat of
        the leading trunk row when omitted
    :param l2: ridge regularization of the branch solve, relative to
        the mean diagonal of the state Gram matrix
    :param projection_damping: Tikhonov damping of the combiner/trunk
        pseudo-inverse, relative to its largest singular value. A raw
        least-norm pseudo-inverse can put enormous weights on the
        basis's near-null directions; they cancel exactly in float64
        but destroy the float32 forward pass, so the damping trades an
        O(damping²) fit bias for float32-safe branch weights
    :returns: ``(refined_params, train_mse)`` where the MSE is measured
        in the model's output space over the given data
    """
    inner = module
    stats = None
    param_tree = params["params"] if "params" in params else params
    inner_tree = param_tree
    if isinstance(module, Standardized):
        inner = module.inner
        stats = (
            np.asarray(module.x_mean, np.float64),
            np.asarray(module.x_std, np.float64),
            np.asarray(module.y_mean, np.float64),
            np.asarray(module.y_std, np.float64),
        )
        inner_tree = param_tree["inner"]
    if not isinstance(inner, DeepONet):
        raise ValueError(
            "refine_affine_deeponet_branch requires a DeepONet "
            "(optionally Standardized)"
        )

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n_b = inner.branch_net_input_size
    if stats is not None:
        x_hat = (x - stats[0]) / stats[1]
        z = (y - stats[2]) / stats[3]
    else:
        x_hat = x
        z = y

    branch_in = x_hat[:, :n_b]
    trunk_in = x_hat[:, n_b:]

    if n_points is None:
        first = trunk_in[0]
        repeats = np.flatnonzero(
            np.all(trunk_in == first, axis=1)
        )
        n_points = (
            int(repeats[1]) if len(repeats) > 1 else len(trunk_in)
        )
    if len(x) % n_points:
        raise ValueError(
            f"data length {len(x)} is not a multiple of the "
            f"{n_points}-row per-state block"
        )
    n_states = len(x) // n_points
    trunk_blocks = trunk_in.reshape(n_states, n_points, -1)
    branch_blocks = branch_in.reshape(n_states, n_points, n_b)
    if not np.allclose(trunk_blocks, trunk_blocks[0]):
        raise ValueError(
            "every state's rows must share the same trunk inputs"
        )
    if not np.allclose(
        branch_blocks, branch_blocks[:, :1], atol=1e-12
    ):
        raise ValueError(
            "every row of a state block must carry the same state"
        )

    # trunk features over the shared points, from the trained trunk
    trunk_features = np.asarray(
        inner.trunk_net.apply(
            {"params": inner_tree["trunk_net"]},
            trunk_blocks[0].astype(np.float32),
        ),
        np.float64,
    )  # (n_points, R)
    rank = trunk_features.shape[-1]

    combiner = _single_dense(inner_tree["combiner_net"], "combiner")
    kernel = np.asarray(combiner["kernel"], np.float64)  # (3R, y_dim)
    bias = np.asarray(combiner["bias"], np.float64)  # (y_dim,)
    if kernel.shape[0] != 3 * rank:
        raise ValueError(
            "combiner kernel does not match [branch, trunk, "
            "branch * trunk] inputs"
        )
    w_b, w_t, w_bt = (
        kernel[:rank],
        kernel[rank: 2 * rank],
        kernel[2 * rank:],
    )
    y_dim = kernel.shape[1]

    # out[i, o] = m[i, o] . b + d[i, o] with b the branch output:
    # m[i, o] = w_b[:, o] + w_bt[:, o] * trunk_features[i]
    m = (
        w_b.T[np.newaxis, :, :]
        + w_bt.T[np.newaxis, :, :] * trunk_features[:, np.newaxis, :]
    )  # (n_points, y_dim, R)
    d = trunk_features @ w_t + bias  # (n_points, y_dim)
    m_stack = m.reshape(n_points * y_dim, rank)
    d_stack = d.reshape(n_points * y_dim)

    # project the targets onto the branch-output space through a
    # DAMPED pseudo-inverse (see ``projection_damping``)
    targets = (
        z.reshape(n_states, n_points * y_dim) - d_stack
    )  # (n_states, n_points * y_dim)
    u, sigma, vt = np.linalg.svd(m_stack, full_matrices=False)
    damping = projection_damping * sigma[0]
    damped = sigma / (sigma**2 + damping**2)
    q = targets @ (u * damped) @ vt  # (n_states, R)

    # ridge solve of branch_out = B s + c over the per-state states
    states = branch_blocks[:, 0, :]  # (n_states, n_b)
    design = np.concatenate(
        [states, np.ones((n_states, 1))], axis=1
    )
    gram = design.T @ design
    gram[np.diag_indices_from(gram)] += l2 * np.trace(gram) / len(
        gram
    )
    theta = np.linalg.solve(gram, design.T @ q)  # (n_b + 1, R)

    branch = _single_dense(inner_tree["branch_net"], "branch")
    new_branch = {
        "Dense_0": {
            "kernel": np.asarray(
                theta[:-1], np.asarray(branch["kernel"]).dtype
            ),
            "bias": np.asarray(
                theta[-1], np.asarray(branch["bias"]).dtype
            ),
        }
    }

    def replace(tree, key, value):
        out = dict(tree)
        out[key] = value
        return out

    new_inner = replace(inner_tree, "branch_net", new_branch)
    new_tree = (
        replace(param_tree, "inner", new_inner)
        if isinstance(module, Standardized)
        else new_inner
    )
    new_params = (
        {"params": new_tree} if "params" in params else new_tree
    )

    # verification: the model must be AFFINE in its state features or
    # the closed-form solve is invalid. Probe the original module at
    # two states and their midpoint — an affine map commutes with the
    # midpoint exactly; comparing against the solved closed form
    # instead would confound nonlinearity with the float32 rounding of
    # large solved weights
    probe_a = x[:n_points].copy()
    probe_b = x[
        (n_states - 1) * n_points: (n_states - 1) * n_points
        + n_points
    ].copy()
    probe_mid = probe_a.copy()
    probe_mid[:, :n_b] = 0.5 * (
        probe_a[:, :n_b] + probe_b[:, :n_b]
    )
    stacked = np.concatenate(
        [probe_a, probe_b, probe_mid]
    ).astype(np.float32)
    out = np.asarray(module.apply(params, stacked), np.float64)
    f_a, f_b, f_mid = (
        out[:n_points],
        out[n_points: 2 * n_points],
        out[2 * n_points:],
    )
    # float32 accumulation over wide branch dots leaves O(1e-5 .. 1e-4)
    # relative midpoint error even for an exactly affine module, while
    # a nonlinear branch violates the midpoint identity at O(1e-1)
    # relative — 1e-2 separates the two cleanly
    scale = np.max(np.abs(out)) + 1e-6
    if not np.allclose(
        f_mid, 0.5 * (f_a + f_b), atol=1e-2 * scale
    ):
        raise ValueError(
            "the module is not affine in its state features — the "
            "branch or combiner net is not linear"
        )

    residual = (
        np.asarray(
            module.apply(
                new_params, x.astype(np.float32)
            ),
            np.float64,
        )
        - y
    )
    return new_params, float(np.mean(residual**2))
