from .base import Solver, Trainable, TrainState
from .oc import CMCD, DDS, PIS, RDS, Bridge, TrainableDiff
from .langevin import LangevinSolver
