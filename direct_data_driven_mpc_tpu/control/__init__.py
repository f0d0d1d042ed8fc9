"""Closed-loop control: fused scan engine + parity controller class."""

from direct_data_driven_mpc_tpu.control.controller import (
    DirectDataDrivenMPCController,
)
from direct_data_driven_mpc_tpu.control.loop import (
    ClosedLoopResult,
    build_closed_loop,
    closed_loop_rollout,
)

__all__ = [
    "DirectDataDrivenMPCController",
    "ClosedLoopResult",
    "build_closed_loop",
    "closed_loop_rollout",
]
