from .solve import linear_solve
from .assemble import (
    assemble_entries,
    assemble_system,
    assemble_system_ac,
    load_gmin,
)
from .pallas_solve import pallas_solve_batched, solve_stamped_for

__all__ = [
    "linear_solve",
    "assemble_entries",
    "assemble_system",
    "assemble_system_ac",
    "load_gmin",
    "pallas_solve_batched",
    "solve_stamped_for",
]
