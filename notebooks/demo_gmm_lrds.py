# %% [markdown]
# # LRDS demo: VP-RDS with a fitted GMM reference on ManyModes
#
# TPU-native counterpart of the reference's notebooks/demo_gmm_lrds.ipynb:
# 1. build the ManyModes target,
# 2. draw a MALA dataset seeded at the modes,
# 3. fit a GMM reference with sklearn EM,
# 4. train VP-RDS (EI integrator, log-variance loss) against that reference,
# 5. check log Z, ESS and the recovered mode weights.
#
# Run as a script (`python notebooks/demo_gmm_lrds.py`) or open with
# jupytext — every `# %%` block is a notebook cell.

# %%
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp

from sde_sampler_lrds_tpu.api import (fit_gmm, make_model, make_target_details,
                                      make_target, mcmc_sample)
from sde_sampler_lrds_tpu.solvers.wrappers import TrainableWrapper

key = jax.random.PRNGKey(0)

# %% build the target (conf/target/many_modes.yaml defaults)
details = make_target_details("many_modes", dim=8, n_modes=4)
target = make_target(details)
target.compute_stats(jax.random.PRNGKey(7))
print("true mode-weight entropy:", target.expectations["emc"])

# %% MALA dataset seeded at the mode centers
key, k_data = jax.random.split(key)
dataset = mcmc_sample(k_data, target, target.loc, step_size=1e-2,
                      dataset_length=40_000)
print("dataset:", dataset.shape)

# %% fit the GMM reference (reg_covar sweep as in the reference pipeline)
weights, means, variances = fit_gmm(4, dataset, em_type="diag")
print("fitted weights:", weights)

# %% build + train VP-RDS with the fitted reference
model = make_model(
    solver_type="vp-ref", ref_type="gmm", loss_type="lv",
    integrator_type="ei", model_type="base_zero_init", time_type="snr",
    solver_details={"sigma": 1.0, "weights_ref": weights, "means_ref": means,
                    "variances_ref": variances},
    target_details=details,
    training_details={"train_steps": 256, "train_batch_size": 1024,
                      "eval_batch_size": 8192},
    n_steps=100)
wrapper = TrainableWrapper(model)
key, k_run = jax.random.split(key)
results = wrapper.run(k_run)

# %% quantitative check (the reference demo's eval/mode_weight cell)
print("log Z (IS):", results.log_norm_const_preds["log_norm_const_is"])
print("elbo:", results.metrics["eval/elbo"])
print("norm ESS:", results.metrics["eval/norm_effective_sample_size"])
print("EUBO:", results.metrics.get("eval/eubo"))
counts = target.compute_mode_count(results.samples)
print("recovered mode weights:", counts / counts.sum())
print("true mode weights:     ", target._probs)

# %% plots (trajectory plots need an eval pass that keeps trajectories)
from sde_sampler_lrds_tpu.eval.plots import get_plots, save_fig

key, k_plot = jax.random.split(key)
traj_results = model.evaluate(k_plot, return_traj=True)
plots = get_plots(target, traj_results.samples, weights=traj_results.weights,
                  ts=traj_results.ts, xs=traj_results.xs, marginal_dims=[0, 1])
out = Path(__file__).parent / "demo_out"
for name, fig in plots.items():
    save_fig(fig, out / f"{name.replace('/', '_')}.png")
print("plots in", out)
