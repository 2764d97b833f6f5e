from .solve import linear_solve
from .assemble import assemble_system, assemble_system_ac, load_gmin

__all__ = ["linear_solve", "assemble_system", "assemble_system_ac", "load_gmin"]
