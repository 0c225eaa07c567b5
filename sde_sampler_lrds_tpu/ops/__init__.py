from .fused_traj import build_plan, fused_simulate
from .resample import multinomial_resample, systematic_resample
