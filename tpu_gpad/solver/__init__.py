"""Online GPAD solvers.

- ``reference``: pure-NumPy oracle (functional replacement for the
  reference's ``seq_functions.cpp`` CPU baseline and ``acceldualgrad.m``).
- ``core``: jitted JAX solver — fixed-iteration and epsilon-termination
  modes, natively batched over scenarios.
- ``kernels``: fused Pallas TPU kernel keeping the whole iteration loop in
  VMEM.
"""

from tpu_gpad.solver.core import (
    solve,
    solve_batch,
    solve_to_accuracy,
    SolverConfig,
)

__all__ = ["solve", "solve_batch", "solve_to_accuracy", "SolverConfig"]
