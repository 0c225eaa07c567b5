from .base import Solver, Trainable, TrainState, TrainConfig
from .oc import CMCD, DDS, PIS, RDS, Bridge, TrainableDiff
from .langevin import LangevinSolver
from .schedulers import CombinedScheduler, MultiStepParams, make_lr_schedule
from .wrappers import TrainableWrapper, TrainableWrapperWithIntermediates, evaluate_eubo
