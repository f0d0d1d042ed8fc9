"""On-chip golden probe for the fused ADMM engine: run the kernel AND
the twin on the REAL TPU against the committed active-set golden
(tests/golden/four_tank_box_golden.npz) and report deviations + the
per-step kernel-vs-twin divergence profile (distinguishes benign
trajectory divergence -- two converged solutions drifting apart
through the transient -- from a kernel bug).

Usage: python scripts/probe_fused_admm_golden.py [CONVEX|BOX]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from direct_data_driven_mpc_tpu.control.controller import (
        DirectDataDrivenMPCController,
    )
    from direct_data_driven_mpc_tpu.ops.lti import LTIParams
    from direct_data_driven_mpc_tpu.ops.pallas_admm import (
        make_fused_admm_rollout,
    )
    from direct_data_driven_mpc_tpu.qp.admm import (
        compute_admm_operator_np,
    )
    from direct_data_driven_mpc_tpu.qp.box import (
        compute_box_admm_operator_np,
    )
    from direct_data_driven_mpc_tpu.qp.spec import (
        DataDrivenMPCType,
        SlackVarConstraintTypes,
    )

    scheme = sys.argv[1] if len(sys.argv) > 1 else "CONVEX"
    g = np.load(
        os.path.join(os.path.dirname(__file__), "..", "tests",
                     "golden", "four_tank_box_golden.npz")
    )
    FOUR_TANK = dict(
        A=np.array(
            [
                [0.921, 0, 0.041, 0],
                [0, 0.918, 0, 0.033],
                [0, 0, 0.924, 0],
                [0, 0, 0, 0.937],
            ]
        ),
        B=np.array(
            [[0.017, 0.001], [0.001, 0.023], [0, 0.061], [0.072, 0]]
        ),
        C=np.array([[1.0, 0, 0, 0], [0, 1, 0, 0]]),
        D=np.zeros((2, 2)),
    )
    plant = LTIParams(
        *(jnp.asarray(a, jnp.float32) for a in FOUR_TANK.values())
    )
    base = dict(
        n=4, m=2, p=2, u_d=g["u_d"], y_d=g["y_d"], L=30,
        Q=3.0 * np.eye(60), R=1e-4 * np.eye(60),
        u_s=np.array([[1.0], [1.0]]), y_s=np.array([[0.65], [0.77]]),
        eps_max=0.002, lamb_alpha=0.1 / 0.002, lamb_sigma=1000.0,
        controller_type=DataDrivenMPCType.ROBUST, n_mpc_step=1,
    )
    if scheme == "CONVEX":
        ctrl = DirectDataDrivenMPCController(
            **base, c=float(g["convex_c"]),
            slack_var_constraint_type=SlackVarConstraintTypes.CONVEX,
        )
        op = compute_admm_operator_np(ctrl.spec)
        iters, cold, tol = (4, 5, 2), 24, 1e-5
    else:
        ctrl = DirectDataDrivenMPCController(
            **base, c=1.0,
            slack_var_constraint_type=SlackVarConstraintTypes.NONE,
        )
        op = compute_box_admm_operator_np(
            ctrl.spec, u_bounds=(-0.85, 0.85), rho=1.0
        )
        iters, cold, tol = (0, 14, 2), 60, 2e-5

    T = g[f"{scheme}_u"].shape[0]
    B = 256
    tile = lambda a: jnp.tile(  # noqa: E731
        jnp.asarray(a, jnp.float32)[None],
        (B,) + (1,) * np.asarray(a).ndim,
    )
    args = (
        tile(g["x0"]),
        tile(g[f"{scheme}_u_past0"]),
        tile(g[f"{scheme}_y_past0"]),
        tile(g["w_sys"][:T]),
    )
    kw = dict(
        n=4, m=2, p=2, n_steps=T, iters=iters, cold_iters=cold, tol=tol
    )
    log(f"device: {jax.devices()[0]}, scheme={scheme}, T={T}, B={B}")
    outs = {}
    for backend in ("pallas", "xla"):
        run = make_fused_admm_rollout(
            plant, op, backend=backend, batch_block=128, **kw
        )
        res = jax.jit(run)(*args)
        jax.block_until_ready(res)
        du = np.abs(
            np.asarray(res.u_sys, np.float64) - g[f"{scheme}_u"][None]
        ).max()
        conv = float(np.asarray(res.converged).mean())
        log(f"{backend}: du vs f64 active-set golden = {du:.3e}, "
            f"converged = {conv:.4f}")
        outs[backend] = np.asarray(res.u_sys[0])
    prof = np.abs(outs["pallas"] - outs["xla"]).max(axis=1)
    log("kernel-vs-twin per-step |du| profile (max over channels):")
    for lo in range(0, T, 20):
        seg = prof[lo : lo + 20]
        log(f"  steps {lo:3d}-{lo + 19:3d}: max {seg.max():.2e}")


if __name__ == "__main__":
    main()
