"""sde_sampler_lrds_tpu — TPU-native neural SDE samplers (LRDS and friends).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``vanilladucky/sde_sampler_lrds`` (Learned Reference-based Diffusion Samplers,
ICLR'25): given only an unnormalized target log-density, learn a control
network for a reverse diffusion so that simulating the controlled SDE from a
simple prior yields target samples, importance weights, and log-Z estimates.

Layer map (bottom-up):
  targets/   probability targets & priors (pure jnp log_prob / score / sample)
  sde/       linear-SDE algebra (VP / CosineVP / PinnedBM / ScaledBM / ConstOU),
             integrators, time grids
  models/    Flax control networks + reparametrizations + EBM potentials
  losses/    trajectory simulators + variational losses (single lax.scan each)
  solvers/   training loop (optax + EMA), sampler algorithms PIS/DDS/DIS/CMCD/RDS
  mcmc/      MALA/ULA/RWMH (+precond) kernels, SMC/PDDS, replica exchange
  ebm/       EBM reference trainers (RE-MLE, DA-EBM, DRL, DSM/TSM)
  eval/      metrics, Sinkhorn, MMD, sliced KS, plots
  ops/       Pallas TPU kernels (Sinkhorn tiles, systematic resampling)
  parallel/  device-mesh sharding of the particle axis
"""

__version__ = "0.1.0"
