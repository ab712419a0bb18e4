from .reference_numpy import advance_mu_t_numpy
