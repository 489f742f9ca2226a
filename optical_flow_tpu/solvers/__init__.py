from optical_flow_tpu.solvers.cg import pcg_solve, solve_flow_system
from optical_flow_tpu.solvers.sor import sor_solve

__all__ = ["pcg_solve", "solve_flow_system", "sor_solve"]
