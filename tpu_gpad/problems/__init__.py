"""Bundled plant models (the L0 modeling layer).

``battery`` reproduces the reference's series-cell battery-balancing problem
(``Code/MATLAB/gpad.m``; ``Documents/BatteryBalancingProblem.pdf``);
``double_integrator`` and ``mass_spring`` are the classical benchmark plants
used in the GPAD paper's experiments (``nmpc12-gpad.pdf`` section 5).
"""

from tpu_gpad.problems.battery import battery, default_x0 as battery_default_x0
from tpu_gpad.problems.double_integrator import double_integrator
from tpu_gpad.problems.mass_spring import mass_spring
from tpu_gpad.problems.pendulum import pendulum_dynamics
from tpu_gpad.problems.point_mass import figure_eight, point_mass_drag
from tpu_gpad.problems.random_lti import random_lti, random_ltv

__all__ = [
    "battery",
    "battery_default_x0",
    "double_integrator",
    "mass_spring",
    "pendulum_dynamics",
    "point_mass_drag",
    "figure_eight",
    "random_lti",
    "random_ltv",
]
