from .base import BaseOCLoss, compute_results
from .rds import DDPMLikeReferenceSDELoss, EIReferenceSDELoss, EMReferenceSDELoss
from .cmcd import ControlledLangevinSDELoss
from .dis import DiscreteTimeReversalLossEI, TimeReversalLoss
from .dds import ExponentialIntegratorSDELoss
