"""Initial-state estimation and equilibrium-pair math.

Capability parity with the reference's
``utilities/initial_state_estimation.py``:

- ``observability_matrix``        (reference :3-24)
- ``toeplitz_input_output_matrix``(reference :26-93)
- ``estimate_initial_state``      (reference :95-133)
- ``calculate_equilibrium_output_from_input`` (reference :135-169)
- ``calculate_equilibrium_input_from_output`` (reference :171-205)

All functions are pure JAX with static shapes. They run at controller /
plant construction time (never in the closed-loop hot path), so they are
kept simple and exact; powers of ``A`` are accumulated with a scan
rather than repeated ``matrix_power`` calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _a_powers(A: jax.Array, t: int) -> jax.Array:
    """Stack ``[I, A, A^2, ..., A^(t-1)]`` of shape ``(t, n, n)``."""
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    if t == 1:
        return eye[None]

    def step(acc, _):
        nxt = acc @ A
        return nxt, nxt

    # Note right-multiplication keeps acc = A^k exactly ordered.
    _, rest = jax.lax.scan(step, eye, None, length=t - 1)
    return jnp.concatenate([eye[None], rest], axis=0)


def observability_matrix(A: jax.Array, C: jax.Array) -> jax.Array:
    """``Ot = vstack(C A^i, i = 0..n-1)`` with ``n = A.shape[0]``."""
    A = jnp.asarray(A)
    C = jnp.asarray(C)
    n = A.shape[0]
    pows = _a_powers(A, n)  # (n, n, n)
    blocks = jnp.einsum("pi,kij->kpj", C, pows)  # (n, p, n)
    return blocks.reshape(n * C.shape[0], n)


def toeplitz_input_output_matrix(
    A: jax.Array, B: jax.Array, C: jax.Array, D: jax.Array, t: int
) -> jax.Array:
    """Block lower-triangular Toeplitz map from inputs to outputs.

    ``Tt[i, j] = D`` if ``i == j``, ``C A^(i-j-1) B`` if ``j < i``, else
    zero, in ``p x m`` blocks over a ``t``-step window (for t = 3::

        [[D     0   0],
         [CB    D   0],
         [CAB   CB  D]]

    reference semantics: initial_state_estimation.py:49-53,83-92).
    """
    t = int(t)
    if t <= 0:
        raise ValueError("The number of time steps t must be positive.")
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    C = jnp.asarray(C)
    D = jnp.asarray(D)
    m = B.shape[1]
    p = C.shape[0]
    # Markov parameters: G[0] = D, G[k] = C A^(k-1) B for k >= 1.
    pows = _a_powers(A, t)  # A^0..A^(t-1); need A^0..A^(t-2) for k=1..t-1
    markov = jnp.einsum("pi,kij,jm->kpm", C, pows[: max(t - 1, 0)], B)
    G = jnp.concatenate([D[None], markov], axis=0) if t > 1 else D[None]
    # Tt block (i, j) = G[i - j] for i >= j. Gather with a clipped index
    # and mask the strictly-upper triangle -- one vectorized build.
    i_idx = jnp.arange(t)[:, None]
    j_idx = jnp.arange(t)[None, :]
    k = i_idx - j_idx  # (t, t), negative above the diagonal
    blocks = G[jnp.clip(k, 0, t - 1)]  # (t, t, p, m)
    blocks = jnp.where((k >= 0)[:, :, None, None], blocks, 0)
    return blocks.transpose(0, 2, 1, 3).reshape(t * p, t * m)


def estimate_initial_state(
    Ot: jax.Array, Tt: jax.Array, U: jax.Array, Y: jax.Array
) -> jax.Array:
    """Least-squares observer: ``x0 = pinv(Ot) @ (Y - Tt @ U)``.

    ``U``/``Y`` are the stacked input/output histories over the window
    (flattened, shapes ``(t*m,)`` / ``(t*p,)``). Reference semantics:
    initial_state_estimation.py:95-133.
    """
    Ot = jnp.asarray(Ot)
    Tt = jnp.asarray(Tt)
    U = jnp.asarray(U)
    Y = jnp.asarray(Y)
    if Ot.shape[0] != Y.shape[0]:
        raise ValueError(
            f"Dimension mismatch: Ot has {Ot.shape[0]} rows but Y has "
            f"{Y.shape[0]} rows."
        )
    if Tt.shape[0] != Y.shape[0]:
        raise ValueError(
            f"Dimension mismatch: Tt has {Tt.shape[0]} rows but Y has "
            f"{Y.shape[0]} rows."
        )
    if Tt.shape[1] != U.shape[0]:
        raise ValueError(
            f"Dimension mismatch: Tt has {Tt.shape[1]} columns but U has "
            f"{U.shape[0]} rows."
        )
    return jnp.linalg.pinv(Ot) @ (Y - Tt @ U)


def dc_gain(
    A: jax.Array, B: jax.Array, C: jax.Array, D: jax.Array
) -> jax.Array:
    """Steady-state (DC) gain ``M = C (I - A)^-1 B + D``."""
    A = jnp.asarray(A)
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    return jnp.asarray(C) @ jnp.linalg.solve(eye - A, jnp.asarray(B)) + D


def calculate_equilibrium_output_from_input(
    A: jax.Array, B: jax.Array, C: jax.Array, D: jax.Array, u_eq: jax.Array
) -> jax.Array:
    """``y_eq = M u_eq`` with the DC gain ``M`` (final value theorem,
    zero initial conditions; reference :135-169)."""
    return dc_gain(A, B, C, D) @ jnp.asarray(u_eq)


def calculate_equilibrium_input_from_output(
    A: jax.Array, B: jax.Array, C: jax.Array, D: jax.Array, y_eq: jax.Array
) -> jax.Array:
    """``u_eq = pinv(M) y_eq`` with the DC gain ``M`` (reference
    :171-205)."""
    return jnp.linalg.pinv(dc_gain(A, B, C, D)) @ jnp.asarray(y_eq)
