from .base import Target, WrapperDistrNN, sample_uniform
from .gauss import (
    GMM,
    BracketTwoModes,
    Gauss,
    GaussFull,
    GMMFull,
    IsotropicGauss,
    ManyModes,
    TwoModes,
    TwoModesFull,
    gmm_params,
    log_prob_gaussian,
    log_prob_gaussian_full,
    score_gauss,
    score_gauss_full,
    score_mog,
    score_mog_full,
)
from .delta import Delta
from .checkerboard import Checkerboard
from .rings import Rings
from .phi_four import PhiFour
from .logistic_regression import LogisticRegression
from .nice import MixtureNice, Nice, NiceModel
