"""Grid-exact posteriors for compiled events: the sharp test oracle.

The sampler targets the joint p(psi, z | reads); its psi-marginal is
  p(psi | reads) propto p(psi) * prod_c [ sum_j pi_j(psi) * P(read | z=j) ]^{n_c}
with pi_j(psi) = softmax(log psi_j + log_iso_w_j) and
P(read | z=j) = exp(log_read_cj) for compatible j.  For small isoform counts
this marginal integrates exactly on a simplex grid, giving a deterministic
reference value for the MCMC posterior mean.
"""
import numpy as np
from scipy.special import logsumexp


def _loglik(psi_grid, ev):
    """psi_grid: (G, I) rows on the simplex. Returns (G,) log-likelihoods."""
    k = ev.num_iso
    lw = ev.log_iso_w[:k]
    W = ev.weights[:, :k]
    LR = ev.log_read[:, :k]
    n = ev.counts
    lp = np.log(psi_grid) + lw[None, :]          # (G, I)
    lognorm = lp - logsumexp(lp, axis=1, keepdims=True)
    # per-class per-grid log prob
    compat = W > 0                                # (C, I)
    terms = lognorm[:, None, :] + LR[None, :, :]  # (G, C, I)
    terms = np.where(compat[None, :, :], terms, -np.inf)
    class_lp = logsumexp(terms, axis=2)           # (G, C)
    class_lp = np.where(n[None, :] > 0, class_lp, 0.0)
    return (class_lp * n[None, :]).sum(axis=1)


def exact_posterior_mean_2iso(ev, grid=20001):
    assert ev.num_iso == 2
    p = np.linspace(1e-6, 1 - 1e-6, grid)
    psi_grid = np.stack([p, 1 - p], axis=1)
    ll = _loglik(psi_grid, ev)
    ll -= ll.max()
    w = np.exp(ll)
    return float((w * p).sum() / w.sum())


def exact_posterior_mean_3iso(ev, grid=400):
    assert ev.num_iso == 3
    eps = 1e-7
    a = np.linspace(eps, 1 - eps, grid)
    A, B = np.meshgrid(a, a, indexing="ij")
    ok = (A + B) < 1 - eps
    p1, p2 = A[ok], B[ok]
    psi_grid = np.stack([p1, p2, 1 - p1 - p2], axis=1)
    ll = _loglik(psi_grid, ev)
    ll -= ll.max()
    w = np.exp(ll)
    w /= w.sum()
    return np.array([(w * psi_grid[:, i]).sum() for i in range(3)])
