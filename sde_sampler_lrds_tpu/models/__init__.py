from .mlp import DenseNet, FourierMLP, TimeEmbed, zero_init_kernel, zero_init_bias
from .reparam import (
    CancelDriftCtrl,
    ClippedCtrl,
    LerpCtrl,
    ScoreCtrl,
    remove_reference_ctrl,
)
from .mnist_unet import Unet
from .mnist_ebm import MNISTEnergy, MNISTNet
from .potentials import (
    BetterPotentialCtrl,
    DRLWrapper,
    EBMAnatomyTrick,
    GaussTiltedPotential,
    GMMTiltedPotential,
)
