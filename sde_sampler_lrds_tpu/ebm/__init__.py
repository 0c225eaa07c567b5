from .mle import MaximumLikelihoodEBM
from .da_ebm import DAEBM, sample_langevin_gibbs_mcmc
from .drl import DiffusionRecoveryLikelihood
from .sm import PerfectScoreMatching, ScoreMatching, TargetScoreMatching
