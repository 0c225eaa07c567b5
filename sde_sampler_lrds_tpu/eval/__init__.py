from .metrics import compute_errors, frac_inside_domain, get_metrics
from .sinkhorn import Sinkhorn
from .mmd import mmd_median
from .ks import compute_sliced_ks
