#!/usr/bin/env python
"""Benchmark: closed-loop QP solves/s/chip, four-tank Robust scheme.

Runs the BASELINE.json config-4 workload on the default (TPU) platform:
4096 Monte-Carlo noise scenarios x 400 closed-loop steps of the paper's
four-tank Robust controller (571-variable QP per step, one solve per
step), executed by the fused vmapped scan engine in float32.

Baseline anchor: the reference implementation re-canonicalizes and
re-solves a CVXPY problem every step on one CPU core. CVXPY is not
installed in this image, so the anchor measured here is a GENEROUS
stand-in: a single-core NumPy re-solve of the full KKT system from
scratch each step (dense factorize + solve, no canonicalization
overhead). Real CVXPY per-step time is strictly larger, so the reported
``vs_baseline`` ratio UNDERSTATES the true speedup vs the reference.

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_baseline_single_core(ctrl, n_solves: int = 10) -> float:
    """Single-core reference-style per-step work: rebuild + dense-solve
    the full KKT system from scratch each step. Returns solves/s."""
    spec = ctrl.spec
    nz, nc = spec.nz, spec.nc
    theta = np.concatenate(
        [ctrl.u_past.reshape(-1), ctrl.y_past.reshape(-1)]
    )
    t0 = time.perf_counter()
    for _ in range(n_solves):
        K = np.zeros((nz + nc, nz + nc))
        K[:nz, :nz] = spec.H
        K[:nz, nz:] = spec.A.T
        K[nz:, :nz] = spec.A
        rhs = np.concatenate([-spec.g, spec.b_const + spec.S @ theta])
        # lstsq (the KKT matrix is singular for NOMINAL variants; the
        # ROBUST default is invertible but we keep one code path).
        z = np.linalg.solve(
            K + 1e-12 * np.eye(nz + nc), rhs
        )
        _ = z[spec.u_pred_slice]
    dt = time.perf_counter() - t0
    return n_solves / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _four_tank_solver
    from direct_data_driven_mpc_tpu.parallel.batch import (
        draw_noise_batch,
        make_batched_rollout,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}")

    B = 4096
    T = 400
    dtype = jnp.float32

    t0 = time.perf_counter()
    plant_model, sol_map, ctrl = _four_tank_solver(dtype)
    log(f"controller init (host, f64 KKT factorization): "
        f"{time.perf_counter() - t0:.2f}s")

    plant = plant_model.as_params(dtype=np.float32)
    n, m, p = 4, 2, 2

    x0s = jnp.tile(
        jnp.asarray(plant_model.get_state(), dtype)[None], (B, 1)
    )
    ups = jnp.tile(
        jnp.asarray(ctrl.u_past.reshape(n, m), dtype)[None], (B, 1, 1)
    )
    yps = jnp.tile(
        jnp.asarray(ctrl.y_past.reshape(n, p), dtype)[None], (B, 1, 1)
    )
    Ws = draw_noise_batch(jax.random.key(0), B, T, p, 0.002, dtype=dtype)

    run = make_batched_rollout(plant, sol_map, n_steps=T, n_mpc_step=1)

    t0 = time.perf_counter()
    result = run(x0s, ups, yps, Ws)
    jax.block_until_ready(result)
    log(f"compile + first run: {time.perf_counter() - t0:.2f}s")
    assert bool(jnp.isfinite(result.u_sys).all()), "non-finite rollout"
    assert bool(jnp.all(result.converged)), "solver lanes not converged"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        result = run(x0s, ups, yps, Ws)
        jax.block_until_ready(result)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    solves = B * T
    solves_per_s = solves / elapsed
    log(f"timed runs: {[f'{t:.3f}s' for t in times]}; "
        f"{solves} solves -> {solves_per_s:,.0f} solves/s/chip")
    log(f"per-step batched latency: {elapsed / T * 1e6:.1f} us "
        f"({B} scenarios/step)")

    # Single-scenario per-step latency (host affine path, p50).
    lat = []
    for _ in range(200):
        t0 = time.perf_counter()
        ctrl.update_and_solve_data_driven_mpc()
        lat.append(time.perf_counter() - t0)
    log(f"single-scenario host solve p50: {np.percentile(lat, 50) * 1e6:.1f} us, "
        f"p99: {np.percentile(lat, 99) * 1e6:.1f} us")

    baseline = measure_baseline_single_core(ctrl)
    log(f"baseline (single-core full KKT re-solve/step, CVXPY-equivalent "
        f"lower bound on cost): {baseline:.1f} solves/s")

    print(
        json.dumps(
            {
                "metric": "closed_loop_qp_solves_per_s_per_chip"
                          "_four_tank_robust",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
