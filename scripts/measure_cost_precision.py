#!/usr/bin/env python
"""On-TPU validation of the mixed-precision cost-channel scheme.

Usage: python scripts/measure_cost_precision.py [B_parity] [B_perf] [T] [R]

Measures, for the four-tank headline kernel (K=50):

1. PARITY -- max |u_sys| / |y_sys| / cost deviation of the kernel at
   ``cost_precision`` "high" (mixed) and "highest" against the exact
   float64 numpy recursion of the SAME fused operator, on identical
   noise (B_parity scenarios x T steps). The 1e-4 budget applies to the
   input deviation.
2. PERF -- amortized per-rollout wall time of both precisions at
   B_perf via ``make_amortized_pallas_run`` (one compile each).

Run on the real chip; records the numbers quoted in docs/PERF.md
"Mixed-precision cost channel". One process = two kernel compiles (mixed +
highest), so allow a few minutes through the remote-compile tunnel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def f64_reference(block_map, s0, W_packed):
    """Exact float64 recursion of the fused operator (numpy)."""
    M_T = np.asarray(block_map.M_T, np.float64)
    N_T = np.asarray(block_map.N_T, np.float64)
    c = np.asarray(block_map.c, np.float64)
    OuW_T = np.asarray(block_map.OuW_T, np.float64)
    OuS_T = np.asarray(block_map.OuS_T, np.float64)
    ou_c = np.asarray(block_map.ou_c, np.float64)
    OyW_T = np.asarray(block_map.OyW_T, np.float64)
    OyS_T = np.asarray(block_map.OyS_T, np.float64)
    oy_c = np.asarray(block_map.oy_c, np.float64)
    OsW_T = np.asarray(block_map.OsW_T, np.float64)
    OsS_T = np.asarray(block_map.OsS_T, np.float64)
    os_c = np.asarray(block_map.os_c, np.float64)
    P = np.asarray(block_map.cost_P, np.float64)
    q = np.asarray(block_map.cost_q, np.float64)
    r = float(block_map.cost_r)
    S = M_T.shape[0]
    n_theta = P.shape[0]
    ns = S - n_theta
    K = os_c.shape[0] // S

    s = np.asarray(s0, np.float64)
    U, Y, C = [], [], []
    for w in np.asarray(W_packed, np.float64):
        U.append(s @ OuS_T + w @ OuW_T + ou_c)
        Y.append(s @ OyS_T + w @ OyW_T + oy_c)
        stack = (s @ OsS_T + w @ OsW_T + os_c).reshape(-1, K, S)
        th = stack[:, :, ns:]
        C.append(
            np.einsum("bkd,de,bke->bk", th, P, th) + th @ q + r
        )
        s = s @ M_T + w @ N_T + c
    return (
        np.stack(U),
        np.stack(Y),
        np.stack(C),
        s,
    )


def main() -> None:
    B_par = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B_perf = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import jax
    import jax.numpy as jnp

    from bench import _controller, time_amortized
    from direct_data_driven_mpc_tpu.control.linear_engine import (
        build_linear_engine,
    )
    from direct_data_driven_mpc_tpu.models.lti_model import LTIModel
    from direct_data_driven_mpc_tpu.ops.pallas_rollout import (
        _center_and_pack,
        make_amortized_pallas_run,
        make_fused_batched_rollout,
        pick_batch_block,
        suggest_solves_per_block,
    )
    from direct_data_driven_mpc_tpu.parallel.batch import draw_noise_batch

    n, m, p, N, L = 4, 2, 2, 400, 30
    rng = np.random.default_rng(0)
    plant = LTIModel(
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
        eps_max=0.002,
    )
    ctrl = _controller(
        N, L, plant, rng, n, m, p,
        np.array([[1.0], [1.0]]), np.array([[0.65], [0.77]]),
    )
    K = suggest_solves_per_block(n, n, m, p, n_steps=T)
    t0 = time.perf_counter()
    bm = build_linear_engine(
        ctrl, plant.as_params(), solves_per_block=K, dtype=jnp.float32
    )
    print(f"compose K={K}: {time.perf_counter() - t0:.1f}s", flush=True)

    dtype = jnp.float32

    def inputs(B):
        x0s = jnp.tile(jnp.asarray(plant.get_state(), dtype)[None], (B, 1))
        ups = jnp.tile(
            jnp.asarray(ctrl.u_past.reshape(n, m), dtype)[None], (B, 1, 1)
        )
        yps = jnp.tile(
            jnp.asarray(ctrl.y_past.reshape(n, p), dtype)[None], (B, 1, 1)
        )
        Ws = draw_noise_batch(
            jax.random.key(0), B, T, p, 0.002, dtype=dtype
        )
        return x0s, ups, yps, Ws

    # ---- parity vs exact f64 recursion -------------------------------
    import math

    x0s, ups, yps, Ws = inputs(B_par)
    steps_per_outer = K
    n_outer = math.ceil(T / steps_per_outer)
    pad = n_outer * steps_per_outer - T
    s0, W_packed = _center_and_pack(
        bm, x0s, ups, yps, Ws, n_outer, steps_per_outer, pad
    )
    t0 = time.perf_counter()
    U64, Y64, C64, _ = f64_reference(
        bm, np.asarray(s0), np.asarray(W_packed)
    )
    u_ref = U64.transpose(1, 0, 2).reshape(B_par, -1, m)[:, :T]
    y_ref = Y64.transpose(1, 0, 2).reshape(B_par, -1, p)[:, :T]
    c_ref = C64.transpose(1, 0, 2).reshape(B_par, -1)[:, :T]
    print(f"f64 numpy reference: {time.perf_counter() - t0:.1f}s",
          flush=True)

    for prec in ("highest", "high"):
        t0 = time.perf_counter()
        run = make_fused_batched_rollout(
            bm, n_steps=T, cost_precision=prec,
            batch_block=pick_batch_block(bm, B_par),
        )
        res = jax.jit(run)(x0s, ups, yps, Ws)
        jax.block_until_ready(res)
        _ = float(res.costs[0, -1])  # readback sync (CLAUDE.md)
        du = float(np.abs(np.asarray(res.u_sys) - u_ref).max())
        dy = float(np.abs(np.asarray(res.y_sys) - y_ref).max())
        dc = float(
            np.abs(np.asarray(res.costs) - c_ref).max()
            / max(1.0, np.abs(c_ref).max())
        )
        print(
            f"PARITY cost_precision={prec}: max|du|={du:.3e} "
            f"max|dy|={dy:.3e} rel|dcost|={dc:.3e} "
            f"(budget 1e-4 on du; compile+run "
            f"{time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    # ---- amortized perf ----------------------------------------------
    args = inputs(B_perf)
    for prec in ("highest", "high"):
        run = make_amortized_pallas_run(
            bm, n_steps=T, cost_precision=prec
        )
        t0 = time.perf_counter()
        checksum, ok = run(*args, 1)
        _ = float(checksum)
        print(
            f"compile+first run [{prec}]: "
            f"{time.perf_counter() - t0:.1f}s ok={bool(ok)}",
            flush=True,
        )
        tm = time_amortized(run, args, R_small=1, R_big=R)
        sps = B_perf * T * R / tm["t_big"]
        print(
            f"PERF cost_precision={prec}: per-rollout "
            f"{tm['per_rep'] * 1e3:.2f} ms, relay "
            f"{tm['per_call_overhead'] * 1e3:.0f} ms "
            f"({tm['overhead_frac_of_big'] * 100:.1f}%), "
            f"{sps:,.0f} solves/s "
            f"(on-device {B_perf * T / tm['per_rep']:,.0f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
