"""gerris_tpu — TPU-native rebuild of the Gerris flow solver.

See README.md for the component map and SURVEY.md for the reference
analysis.  Quick imports:

    from gerris_tpu import Grid, NSConfig, Simulation, Time
"""
from .core.grid import Grid
from .core import bc
from .models.ns import NSConfig
from .models.simulation import Simulation, Time
from .models.classes import PoissonSimulation, AdvectionSimulation

__all__ = ["Grid", "bc", "NSConfig", "Simulation", "Time",
           "PoissonSimulation", "AdvectionSimulation"]
__version__ = "0.1.0"
