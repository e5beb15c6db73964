"""Optimal-control solvers: batched ADMM QP, RTI/SQP MPC, Riccati LQR."""

from racing_lmpc_tpu.mpc.qp import QPData, QPSolution, solve_qp, admm_solve

__all__ = [
    "QPData",
    "QPSolution",
    "solve_qp",
    "admm_solve",
]
