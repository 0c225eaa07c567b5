from .linear import (
    OU,
    ConstOU,
    CosineVP,
    PinnedBM,
    ScaledBM,
    VP,
)
from .langevin import ControlledLangevinSDE, ControlledSDE, LangevinSDE
from .integrator import EulerIntegrator, integrate_sde
from ..utils.common import get_timesteps
