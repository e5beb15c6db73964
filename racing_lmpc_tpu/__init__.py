"""TPU-native Learning Model Predictive Control engine for autonomous racing.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
MPC-Berkeley/Racing-LMPC-ROS2 (reference: /root/reference):

- ``ops``        — math core: angle/abscissa wrapping, integrators, exact
                   discretization, splines, table lookups.
- ``models``     — vehicle dynamics (kinematic bicycle, Pacejka single-track,
                   double-track) as pure JAX functions with AD Jacobians.
- ``track``      — periodic Frenet-frame track model with device-resident
                   spline interpolants and fixed-iteration global→frenet.
- ``mpc``        — batched real-time-iteration MPC: OSQP-style ADMM QP with
                   dense/structured KKT solves, SQP bootstrap, Riccati LQR.
- ``safeset``    — device-resident safe set (LMPC terminal constraint),
                   cost-to-go, lap recorder, error-dynamics regression.
- ``estimation`` — EKF state estimator.
- ``control``    — control-loop orchestration, pure-pursuit/PID baseline,
                   telemetry and cycle profiling.
- ``sim``        — vectorized lap simulation harness (lax.scan).
- ``parallel``   — mesh/sharding utilities for multi-chip scaling.

Everything compute-heavy is jit-compiled once and batched with vmap; scenario
batches shard over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from racing_lmpc_tpu import ops  # noqa: F401
