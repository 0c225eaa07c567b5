from .common import Results, binary_search_v, get_timesteps, masked_mean, masked_var
