"""Batched construction of per-realization solution operators.

Heterogeneous Monte-Carlo sweeps (BASELINE config 4: different Hankel
DATA REALIZATIONS per scenario) previously built each realization's
affine solution operator with a serial host loop -- ~40 ms of dense
KKT factorization each, ~3 minutes of host time before a
4096-realization sweep reaches the device (round-1 VERDICT item 6).

This module replaces that loop with one structured batched
factorization. For the ROBUST slack-NONE family with diagonal Q/R (the
standard configuration) the Hessian is DIAGONAL, so the KKT system
collapses by block elimination:

1. Selection-pinned variables (internal-state rows pin ubar/ybar's
   first n blocks to theta; terminal rows pin the last n blocks to the
   tiled setpoints -- reference constraints at
   direct_data_driven_mpc_controller.py:549-629) are eliminated
   symbolically: their values are affine in theta by inspection.
2. The remaining free variables have strictly positive diagonal
   curvature (alpha/sigma ridges, prediction-segment R/Q), so the
   dynamics-row multipliers solve a SCHUR system

       S_c = (1/h_alpha) G G^T + diag(c),   G = [H_u; H_y],

   i.e. ONE batched (B, n_dyn, n_alpha) matmul plus a batched
   (B, n_dyn, n_dyn) solve -- ~20x fewer FLOPs than the dense
   (nz+nc)^3 factorization, and every step is a single BLAS batch call
   instead of B Python iterations.

Equality with the generic serial path is asserted to float64 roundoff
in tests/test_batch_build.py; non-diagonal weights or NOMINAL
controllers (singular Hessian) fall back to the serial loop
(:func:`build_solution_operators_fallback`).

Negative result (measured, do not retry): computing the Gram G G^T via
sliding-window cross-correlations of the underlying series (exploiting
the Hankel structure; ~30x fewer FLOPs) is 3x SLOWER than the dense
batched matmul on this host -- the elementwise products + cumsum are
bandwidth-bound numpy loops while the dense gemm runs in BLAS.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from direct_data_driven_mpc_tpu.qp.spec import (
    DataDrivenMPCType,
    QPDims,
    SlackVarConstraintTypes,
)


def _is_diagonal(M: np.ndarray) -> bool:
    return bool(
        np.abs(M - np.diag(np.diag(M))).max(initial=0.0)
        <= 1e-12 * max(1.0, np.abs(M).max(initial=0.0))
    )


def build_batched_solution_operators(
    HLn_ud: np.ndarray,
    HLn_yd: np.ndarray,
    dims: QPDims,
    Q: np.ndarray,
    R: np.ndarray,
    u_s: np.ndarray,
    y_s: np.ndarray,
    eps_max: float,
    lamb_alpha: float,
    lamb_sigma: float,
    use_terminal_constraint: bool = True,
    chunk: int = 512,
) -> dict:
    """Build B solution operators from batched Hankel data in one
    structured batched factorization.

    Args:
        HLn_ud: ``(B, (L+n)m, n_alpha)`` input Hankel matrices.
        HLn_yd: ``(B, (L+n)p, n_alpha)`` output Hankel matrices.
        dims, Q, R, u_s, y_s, eps_max, lamb_alpha, lamb_sigma,
        use_terminal_constraint: as in ``assembly.build_qp_spec``
        (ROBUST, slack NONE implied -- see module docstring).
        chunk: realizations per BLAS batch (memory knob).

    Returns:
        dict of stacked float64 arrays with the keys of
        ``solution_map.compute_solution_operator_np`` (leading batch
        axis) plus ``feasible`` of shape ``(B,)``.

    Raises:
        NotImplementedError: non-diagonal Q/R (use the serial
            fallback).
    """
    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    if not (_is_diagonal(Q) and _is_diagonal(R)):
        raise NotImplementedError(
            "Batched operator construction requires diagonal Q/R "
            "weighting blocks; use build_solution_operators_fallback."
        )
    if min(float(eps_max), float(lamb_alpha), float(lamb_sigma)) <= 0:
        raise ValueError(
            "Batched construction covers the ROBUST family "
            "(eps_max, lamb_alpha, lamb_sigma > 0); NOMINAL operators "
            "(singular Hessian) use the serial fallback."
        )

    n, m, p, L = dims.n, dims.m, dims.p, dims.L
    na, n_u, n_y = dims.n_alpha, dims.n_u, dims.n_y
    n_theta = dims.n_theta
    HLn_ud = np.asarray(HLn_ud, dtype=np.float64)
    HLn_yd = np.asarray(HLn_yd, dtype=np.float64)
    B = HLn_ud.shape[0]
    if HLn_ud.shape != (B, n_u, na) or HLn_yd.shape != (B, n_y, na):
        raise ValueError(
            f"Hankel batches must be {(B, n_u, na)} / {(B, n_y, na)}; "
            f"got {HLn_ud.shape} / {HLn_yd.shape}."
        )
    u_s = np.asarray(u_s, dtype=np.float64).reshape(-1)
    y_s = np.asarray(y_s, dtype=np.float64).reshape(-1)

    # --- Layout (matches assembly.build_qp_spec) ----------------------
    nz = na + n_u + 2 * n_y
    a0, u0, y0, s0 = 0, na, na + n_u, na + n_u + n_y
    n_dyn = n_u + n_y
    nm, npp = n * m, n * p
    u_sL, y_sL = np.tile(u_s, L), np.tile(y_s, L)

    # Diagonal Hessian d and gradient g (realization-independent).
    h_alpha = 2.0 * float(lamb_alpha) * float(eps_max)
    h_sigma = 2.0 * float(lamb_sigma)
    d = np.zeros(nz)
    g = np.zeros(nz)
    d[a0:u0] = h_alpha
    d[u0 + nm : u0 + n_u] = 2.0 * np.diag(R)
    d[y0 + npp : y0 + n_y] = 2.0 * np.diag(Q)
    d[s0:] = h_sigma
    g[u0 + nm : u0 + n_u] = -2.0 * np.diag(R) * u_sL
    g[y0 + npp : y0 + n_y] = -2.0 * np.diag(Q) * y_sL
    r0 = float(u_sL @ (np.diag(R) * u_sL) + y_sL @ (np.diag(Q) * y_sL))

    # Pinned variables: value = pin_base + pin_theta @ theta.
    # Internal rows pin ubar[:nm] = theta_u, ybar[:np] = theta_y
    # (ref :549-583); terminal rows pin the last n blocks to the tiled
    # setpoints (ref :585-629).
    pinned = np.zeros(nz, dtype=bool)
    pin_base = np.zeros(nz)
    pin_theta = np.zeros((nz, n_theta))
    pinned[u0 : u0 + nm] = True
    pin_theta[u0 : u0 + nm, 0:nm] = np.eye(nm)
    pinned[y0 : y0 + npp] = True
    pin_theta[y0 : y0 + npp, nm : nm + npp] = np.eye(npp)
    if use_terminal_constraint:
        pinned[u0 + L * m : u0 + n_u] = True
        pin_base[u0 + L * m : u0 + n_u] = np.tile(u_s, n)
        pinned[y0 + L * p : y0 + n_y] = True
        pin_base[y0 + L * p : y0 + n_y] = np.tile(y_s, n)

    u_pin = pinned[u0 : u0 + n_u]  # per dynamics-u row
    y_pin = pinned[y0 : y0 + n_y]  # per dynamics-y row
    d_u = d[u0 : u0 + n_u]
    d_y = d[y0 : y0 + n_y]
    g_u = g[u0 : u0 + n_u]
    g_y = g[y0 : y0 + n_y]

    # Constant diagonal of the Schur complement (free-identity columns
    # of the dynamics rows): free ubar_i adds 1/d_u_i to row i; free
    # ybar_j adds 1/d_y_j; sigma_j always adds 1/h_sigma to row n_u+j.
    c0 = np.zeros(n_dyn)
    c0[:n_u] = np.where(u_pin, 0.0, 1.0 / np.where(u_pin, 1.0, d_u))
    c0[n_u:] = (
        np.where(y_pin, 0.0, 1.0 / np.where(y_pin, 1.0, d_y))
        + 1.0 / h_sigma
    )

    # Multi-RHS columns: [base | theta_1 .. theta_n_theta].
    ncol = 1 + n_theta
    # Stationarity contribution A_dF D^-1 w (w = -g, col 0 only; the
    # alpha and sigma gradients are zero).
    r1 = np.zeros((n_dyn, ncol))
    r1[:n_u, 0] = np.where(u_pin, 0.0, -g_u / np.where(u_pin, 1.0, d_u))
    r1[n_u:, 0] = np.where(y_pin, 0.0, -g_y / np.where(y_pin, 1.0, d_y))
    # Constraint RHS: dynamics rows read 0 = A_dF z_F + v_pinned, so
    # b_reduced = -v_pinned(theta) at pinned rows.
    b_red = np.zeros((n_dyn, ncol))
    b_red[:n_u, 0] = -pin_base[u0 : u0 + n_u]
    b_red[:n_u, 1:] = -pin_theta[u0 : u0 + n_u]
    b_red[n_u:, 0] = -pin_base[y0 : y0 + n_y]
    b_red[n_u:, 1:] = -pin_theta[y0 : y0 + n_y]
    rhs_const = r1 - b_red  # (n_dyn, ncol), realization-independent

    # Stationarity RHS per column for the free-variable recovery
    # (w = -g in the base column ONLY; theta columns carry zero w).
    w_u = np.zeros((n_u, ncol))
    w_u[:, 0] = -g_u
    w_y = np.zeros((n_y, ncol))
    w_y[:, 0] = -g_y

    u_pred = slice(u0 + nm, u0 + n_u)

    z_out = np.zeros((B, nz, ncol))
    feasible = np.zeros(B, dtype=bool)

    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        G = np.concatenate(
            [HLn_ud[lo:hi], HLn_yd[lo:hi]], axis=1
        )  # (Bc, n_dyn, na)
        # Schur complement: ONE batched matmul + constant diagonal.
        S_c = (G @ G.transpose(0, 2, 1)) / h_alpha
        S_c[:, np.arange(n_dyn), np.arange(n_dyn)] += c0
        nu = np.linalg.solve(S_c, rhs_const[None])  # (Bc, n_dyn, ncol)

        # Free-variable recovery: z_F = D^-1 (w - A_dF^T nu).
        z = z_out[lo:hi]
        z[:, a0:u0] = (G.transpose(0, 2, 1) @ nu) / h_alpha
        nu_u, nu_y = nu[:, :n_u], nu[:, n_u:]
        free_u = ~u_pin
        safe_du = np.where(u_pin, 1.0, d_u)
        z[:, u0 : u0 + n_u] = np.where(
            free_u[None, :, None],
            (w_u[None] - nu_u) / safe_du[None, :, None],
            0.0,
        )
        free_y = ~y_pin
        safe_dy = np.where(y_pin, 1.0, d_y)
        z[:, y0 : y0 + n_y] = np.where(
            free_y[None, :, None],
            (w_y[None] - nu_y) / safe_dy[None, :, None],
            0.0,
        )
        z[:, s0:] = -nu_y / h_sigma
        # Pinned rows (affine in theta by construction).
        z[:, pinned, 0] += pin_base[pinned]
        z[:, pinned, 1:] += pin_theta[pinned]

        # Feasibility certificate: the dynamics identities must hold
        # for EVERY theta column (selection rows hold by construction).
        res_u = z[:, u0 : u0 + n_u] - G[:, :n_u] @ z[:, a0:u0]
        res_y = (
            z[:, y0 : y0 + n_y]
            + z[:, s0:]
            - G[:, n_u:] @ z[:, a0:u0]
        )
        scale = max(1.0, np.abs(u_s).max(initial=0.0),
                    np.abs(y_s).max(initial=0.0))
        res = np.maximum(
            np.abs(res_u).max(axis=(1, 2)), np.abs(res_y).max(axis=(1, 2))
        )
        feasible[lo:hi] = res < 1e-7 * scale

    z_base = z_out[:, :, 0]
    Z = z_out[:, :, 1:]

    # Cost as a quadratic in theta (identical formulas to
    # compute_solution_operator_np; H is diagonal here). Batched
    # matmuls, not einsum -- numpy's einsum does not dispatch these
    # contractions to BLAS and is ~5x slower at this scale.
    dZ = d[None, :, None] * Z
    cost_P = 0.5 * (Z.transpose(0, 2, 1) @ dZ)
    cost_P = 0.5 * (cost_P + cost_P.transpose(0, 2, 1))
    cost_q = (
        Z.transpose(0, 2, 1)
        @ (d[None, :] * z_base + g[None, :])[:, :, None]
    )[:, :, 0]
    cost_r = (
        0.5 * np.sum(z_base * (d[None, :] * z_base), axis=1)
        + z_base @ g
        + r0
    )

    return {
        "z_base": z_base,
        "Z": Z,
        "u_base": z_base[:, u_pred],
        "U_gain": Z[:, u_pred],
        "cost_P": cost_P,
        "cost_q": cost_q,
        "cost_r": cost_r,
        "feasible": feasible,
    }


def build_solution_operators_fallback(
    HLn_ud: np.ndarray,
    HLn_yd: np.ndarray,
    dims: QPDims,
    Q: np.ndarray,
    R: np.ndarray,
    u_s: np.ndarray,
    y_s: np.ndarray,
    controller_type: DataDrivenMPCType = DataDrivenMPCType.ROBUST,
    eps_max: Optional[float] = None,
    lamb_alpha: Optional[float] = None,
    lamb_sigma: Optional[float] = None,
    c: Optional[float] = None,
    use_terminal_constraint: bool = True,
) -> dict:
    """Serial per-realization construction (generic path: any weights,
    NOMINAL included), stacked to the same contract as
    :func:`build_batched_solution_operators`."""
    from direct_data_driven_mpc_tpu.qp.assembly import build_qp_spec
    from direct_data_driven_mpc_tpu.qp.solution_map import (
        compute_solution_operator_np,
    )

    ops = []
    for Hu, Hy in zip(np.asarray(HLn_ud), np.asarray(HLn_yd)):
        spec = build_qp_spec(
            Hu, Hy, dims, Q, R, u_s, y_s,
            controller_type=controller_type,
            eps_max=eps_max, lamb_alpha=lamb_alpha,
            lamb_sigma=lamb_sigma, c=c,
            slack_var_constraint_type=SlackVarConstraintTypes.NONE,
            use_terminal_constraint=use_terminal_constraint,
        )
        ops.append(compute_solution_operator_np(spec))
    keys = ("z_base", "Z", "u_base", "U_gain", "cost_P", "cost_q",
            "cost_r", "feasible")
    return {k: np.stack([np.asarray(op[k]) for op in ops]) for k in keys}


def stacked_solution_map(ops: dict, dtype=None):
    """Device-resident stacked :class:`SolutionMap` (leading scenario
    axis) from a batched-operator dict -- the direct input to
    ``parallel.batch.heterogeneous_closed_loop``."""
    import jax.numpy as jnp

    from direct_data_driven_mpc_tpu.qp.solution_map import (
        SolutionMap,
        _check_dtype_supported,
    )

    dtype = dtype or jnp.float32
    _check_dtype_supported(dtype)
    return SolutionMap(
        **{
            k: jnp.asarray(ops[k], dtype=dtype)
            for k in SolutionMap._fields
        }
    )
