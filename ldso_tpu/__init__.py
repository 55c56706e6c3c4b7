"""ldso_tpu — a TPU-native monocular direct-sparse SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LDSO
(Direct Sparse Odometry with Loop Closure, reference: n-lalanne/LDSO):
pyramidal direct image alignment, sliding-window photometric bundle
adjustment with Schur-complement marginalization and First-Estimate
Jacobians, corner-biased point selection with ORB-style descriptors,
bag-of-words loop detection, and global Sim(3) pose-graph optimization.

Design stance (see SURVEY.md §7.0):
  * functional core / imperative shell — all numerics are pure jitted
    functions over pytrees; a thin host conductor owns the frame loop.
  * static shapes everywhere — fixed capacities + validity masks.
  * the windowed BA reduces to a handful of large matmuls (MXU) plus a
    tiny dense solve, and shards over a device mesh with one psum per
    Gauss-Newton iteration.
"""

__version__ = "0.1.0"
