"""Hermetic (CPU) control-flow regression test for the fused Pallas
REASSIGN kernel.

The Mosaic interpreter has no PRNG (prng_random_bits returns zeros), so
the kernel's *distribution* can only be validated on a real TPU
(tests/test_pallas.py).  But with MISO_PALLAS_NO_PRNG the kernel is
fully deterministic (every uniform is 0.4999), so its control flow --
the MH/Gibbs recurrence, burn-in/lag record schedule, 128-row staging
flushes, padded-read count telescoping, output lane layout -- can be
checked exactly against an independent numpy simulation of the same
math, in the Pallas interpreter, on CPU.
"""
import numpy as np
import pytest

import jax

import miso_tpu.sampler.pallas_kernel as pk
from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig

U = 0.4999  # the _DEBUG_NO_PRNG constant for every uniform draw


def _sim_event(read_w, rls, log_iso_w, hyper, num_iso, cfg, R,
               start_psi=None):
    """Numpy replica of one (event, chain) lane of _sampler_kernel."""
    I = read_w.shape[1]
    iso_mask = (np.arange(I) < num_iso).astype(np.float64)
    amask = (np.arange(I) < num_iso - 1).astype(np.float64)
    last_onehot = (np.arange(I) == num_iso - 1).astype(np.float64)
    km1 = amask.sum()
    kk = km1 + 1.0
    sigma = 0.2 / (num_iso * num_iso)
    noise_scale = sigma if num_iso == 2 else np.sqrt(sigma)
    from scipy.special import gammaln
    h = np.where(iso_mask > 0, hyper, 1.0)
    dir_const = gammaln(np.sum(np.where(iso_mask > 0, h, 0.0))) - \
        np.sum(np.where(iso_mask > 0, gammaln(h), 0.0))
    eiw = np.exp(np.maximum(log_iso_w, -1e30)) * iso_mask
    a_liw = np.where(iso_mask > 0, np.maximum(log_iso_w, -1e30), 0.0)
    h1 = np.where(iso_mask > 0, h - 1.0, 0.0)
    H1 = h1.sum()

    def normal_rows():
        # _normal_rows with u1 = u2 = U: one shared Box-Muller radius
        r = np.sqrt(-2.0 * np.log(max(U, 2.0 ** -24)))
        ang = 2.0 * np.pi * U
        if I == 1:
            return np.array([r * np.cos(ang)])
        H = (I + 1) // 2
        z = np.concatenate([np.full(H, r * np.cos(ang)),
                            np.full(H, r * np.sin(ang))])
        return z[:I]

    def stats(alpha):
        e = np.exp(alpha) * amask
        denom = 1.0 + e.sum()
        ld = np.log(denom)
        e_aug = e + last_onehot
        psi = e_aug / denom
        logS = np.log(max((e_aug * eiw).sum(), 1e-38))
        return psi, ld, logS

    valid = read_w.sum(axis=1) > 0
    n_valid = valid.sum()
    n_pad = float(R) - n_valid

    def gibbs(psi):
        rw = read_w * psi[None, :]
        cums = np.cumsum(rw, axis=1)
        acc = cums[:, -1]
        u = max(U, 2.0 ** -24) * acc
        n = np.zeros(I)
        for i in range(I):
            ge = (cums[:, i] >= u) if i < I - 1 else valid
            prev = (cums[:, i - 1] >= u) if i > 0 else np.zeros(R, bool)
            oh = ge.astype(float) - prev.astype(float)
            n[i] = oh.sum()
        n[0] -= n_pad
        if I > 1:
            n[-1] += n_pad
        return n

    def read_prob(psi):
        rw = read_w * psi[None, :]
        cums = np.cumsum(rw, axis=1)
        acc = cums[:, -1]
        u = max(U, 2.0 ** -24) * acc
        rp = 0.0
        for i in range(I):
            ge = (cums[:, i] >= u) if i < I - 1 else valid
            prev = (cums[:, i - 1] >= u) if i > 0 \
                else np.zeros(R, bool)
            oh = ge.astype(float) - prev.astype(float)
            rp += (oh * rls[:, i]).sum()
        return rp

    if start_psi is not None:
        sp_last = (start_psi * last_onehot).sum()
        alpha0 = np.where(amask > 0,
                          np.log(np.maximum(start_psi, 1e-30))
                          - np.log(max(sp_last, 1e-30)), 0.0)
    else:
        alpha0 = np.where(amask > 0,
                          0.0 if km1 == 1.0 else 1.0 / max(km1, 1.0), 0.0)
    alpha = alpha0 + noise_scale * normal_rows() * amask
    psi, ld, logS = stats(alpha)
    n = gibbs(psi)
    rp = read_prob(psi)
    acc_count = 0.0

    rec_psi, rec_ll = [], []
    for m in range(cfg.iters):
        full = 1.0 if m > 0 else 0.0
        d = noise_scale * normal_rows() * amask
        alpha_new = alpha + d
        psi_new, ld_new, logS_new = stats(alpha_new)
        logr = (((n + h1) * d).sum() - n_valid * (logS_new - logS)
                - H1 * (ld_new - ld)
                + full * (d.sum() + kk * (ld - ld_new)))
        accept = 1.0 if (logr >= 0 or np.log(max(U, 2.0 ** -24)) < logr) \
            else 0.0
        if accept:
            alpha, psi, ld, logS = alpha_new, psi_new, ld_new, logS_new
        acc_count += accept
        recorded = (m + 1 > cfg.burn_in
                    and (m + 1 - cfg.burn_in) % cfg.lag == 0)
        if recorded:
            a_aug = alpha * amask
            t = ((n + h1) * a_aug + n * a_liw).sum()
            score = rp + t - n_valid * logS - H1 * ld + dir_const
            rec_psi.append(psi.copy())
            rec_ll.append(score)
        n = gibbs(psi)
        rp = read_prob(psi)
    return np.array(rec_psi), np.array(rec_ll), acc_count, n, psi


@pytest.mark.parametrize("num_iso", [2, 3])
def test_kernel_matches_numpy_sim_interpret(monkeypatch, num_iso):
    monkeypatch.setattr(pk, "_DEBUG_NO_PRNG", True)

    R, E, K = 16, 2, 2
    I = num_iso
    rng = np.random.default_rng(0)
    # compatibility patterns with a couple of padded (all-zero) reads
    read_w = (rng.random((E, R, I)) < 0.7).astype(np.float32)
    read_w[:, -3:, :] = 0.0
    read_w[:, 0, :] = 1.0
    rls = np.where(read_w > 0, np.log(0.01 + rng.random((E, R, I))), 0.0
                   ).astype(np.float32)
    log_iso_w = np.log(np.array([[200.0, 120.0, 80.0][:I]] * E,
                                np.float32))
    hyper = np.ones((E, I), np.float32)
    batch = EventBatch(
        weights=np.zeros((E, 4, I), np.float32),
        log_read=np.zeros((E, 4, I), np.float32),
        counts=np.zeros((E, 4), np.float32),
        log_iso_w=log_iso_w,
        hyper=hyper,
        num_iso=np.full((E,), num_iso, np.int32),
        read_w=read_w,
        read_logscore=rls,
    )
    cfg = SamplerConfig(iters=24, burn_in=6, lag=3, chains=K)
    out = pk.run_batch_pallas(jax.random.PRNGKey(0), batch, cfg,
                              interpret=True)
    psi_s = np.asarray(out.psi_samples)    # (E, RREC, K, I)
    ll = np.asarray(out.loglik)            # (E, RREC, K)
    accepted = np.asarray(out.accepted)    # (E,)
    final_n = np.asarray(out.final_n)      # (E, K, I)
    final_psi = np.asarray(out.final_psi)

    for e in range(E):
        sim_psi, sim_ll, sim_acc, sim_n, sim_fpsi = _sim_event(
            read_w[e].astype(np.float64), rls[e].astype(np.float64),
            log_iso_w[e].astype(np.float64),
            hyper[e].astype(np.float64), num_iso, cfg, R)
        for k in range(K):   # chains are identical under fixed PRNG
            np.testing.assert_allclose(psi_s[e, :, k, :], sim_psi,
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(ll[e, :, k], sim_ll,
                                       rtol=0, atol=2e-3)
            np.testing.assert_allclose(final_n[e, k], sim_n, atol=1e-5)
            np.testing.assert_allclose(final_psi[e, k], sim_fpsi,
                                       atol=2e-4)
        assert accepted[e] == pytest.approx(sim_acc * K)


def _sim_marginal(weights, counts, hyper, num_iso, cfg, start_psi=None):
    """Numpy replica of one (event, chain) lane of _marginal_kernel."""
    from scipy.special import gammaln
    C, I = weights.shape
    iso_mask = (np.arange(I) < num_iso).astype(float)
    amask = (np.arange(I) < num_iso - 1).astype(float)
    last = (np.arange(I) == num_iso - 1).astype(float)
    km1 = amask.sum()
    sigma = 0.2 / (num_iso * num_iso)
    noise_scale = sigma if num_iso == 2 else np.sqrt(sigma)
    inv_sigma = 1.0 / sigma
    prop_const = -0.5 * (num_iso - 1.0) * np.log(2.0 * np.pi * sigma)
    h = np.where(iso_mask > 0, hyper, 1.0)
    dir_const = gammaln(np.sum(np.where(iso_mask > 0, h, 0.0))) - \
        np.sum(np.where(iso_mask > 0, gammaln(h), 0.0))

    def normal_rows():
        # _normal((I, B)) draws I independent Box-Muller values; with
        # fixed u1 = u2 = U they are all equal
        r = np.sqrt(-2.0 * np.log(max(U, 2.0 ** -24)))
        return np.full(I, r * np.cos(2.0 * np.pi * U))

    def logistic_inv(alpha):
        e = np.exp(alpha) * amask
        denom = 1.0 + e.sum()
        head = e / denom
        return head + last * (1.0 - head.sum())

    def joint_score(psi):
        s = weights @ psi
        read_term = np.where(s > 0, counts * np.log(np.maximum(s, 1e-38)),
                             0.0).sum()
        dirp = np.where(iso_mask > 0,
                        (h - 1.0) * np.log(np.maximum(psi, 1e-38)),
                        0.0).sum() + dir_const
        return read_term + dirp

    def proposal_score(psi, mu_alpha):
        ltheta = (psi * last).sum()
        logpsi = np.where(amask > 0, np.log(np.maximum(psi, 1e-38)), 0.0)
        tmp = np.where(amask > 0,
                       logpsi - np.log(max(ltheta, 1e-38)) - mu_alpha, 0.0)
        return (prop_const - logpsi.sum() - np.log(max(ltheta, 1e-38))
                - 0.5 * (tmp * tmp).sum() * inv_sigma)

    if start_psi is not None:
        sp_last = (start_psi * last).sum()
        alpha0 = np.where(amask > 0,
                          np.log(np.maximum(start_psi, 1e-30))
                          - np.log(max(sp_last, 1e-30)), 0.0)
    else:
        alpha0 = np.where(amask > 0,
                          0.0 if km1 == 1.0 else 1.0 / max(km1, 1.0), 0.0)
    alpha = alpha0 + noise_scale * normal_rows() * amask
    psi = logistic_inv(alpha)
    acc_count = 0.0
    rec_psi, rec_ll = [], []
    for m in range(cfg.iters):
        full = 1.0 if m > 0 else 0.0
        alpha_new = alpha + noise_scale * normal_rows() * amask
        psi_new = logistic_inv(alpha_new)
        logr = (joint_score(psi_new) - joint_score(psi)
                + full * (proposal_score(psi, alpha_new)
                          - proposal_score(psi_new, alpha)))
        if logr >= 0 or np.log(max(U, 2.0 ** -24)) < logr:
            alpha, psi = alpha_new, psi_new
            acc_count += 1.0
        if (m + 1 > cfg.burn_in
                and (m + 1 - cfg.burn_in) % cfg.lag == 0):
            rec_psi.append(psi.copy())
            rec_ll.append(joint_score(psi))
    return np.array(rec_psi), np.array(rec_ll), acc_count, psi


@pytest.mark.parametrize("num_iso", [2, 3])
def test_marginal_kernel_matches_numpy_sim_interpret(monkeypatch, num_iso):
    import miso_tpu.sampler.pallas_marginal as pm
    monkeypatch.setattr(pk, "_DEBUG_NO_PRNG", True)

    E, K, C, I = 2, 2, 4, num_iso
    rng = np.random.default_rng(1)
    weights = rng.random((E, C, I)).astype(np.float32)
    weights[:, -1, :] = 0.0          # an empty class
    counts = np.array([[30.0, 20.0, 10.0, 0.0]] * E, np.float32)
    hyper = np.ones((E, I), np.float32)
    batch = EventBatch(
        weights=weights,
        log_read=np.zeros((E, C, I), np.float32),
        counts=counts,
        log_iso_w=np.zeros((E, I), np.float32),
        hyper=hyper,
        num_iso=np.full((E,), num_iso, np.int32),
        read_w=np.zeros((E, 1, I), np.float32),
        read_logscore=np.zeros((E, 1, I), np.float32),
    )
    cfg = SamplerConfig(iters=24, burn_in=6, lag=3, chains=K,
                        algorithm="marginal")
    out = pm.run_batch_pallas_marginal(jax.random.PRNGKey(0), batch, cfg,
                                       interpret=True)
    psi_s = np.asarray(out.psi_samples)
    ll = np.asarray(out.loglik)
    accepted = np.asarray(out.accepted)
    final_psi = np.asarray(out.final_psi)
    for e in range(E):
        sim_psi, sim_ll, sim_acc, sim_fpsi = _sim_marginal(
            weights[e].astype(np.float64), counts[e].astype(np.float64),
            hyper[e].astype(np.float64), num_iso, cfg)
        for k in range(K):
            np.testing.assert_allclose(psi_s[e, :, k, :], sim_psi,
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(ll[e, :, k], sim_ll,
                                       rtol=0, atol=2e-3)
            np.testing.assert_allclose(final_psi[e, k], sim_fpsi,
                                       atol=2e-4)
        assert accepted[e] == pytest.approx(sim_acc * K)


def test_kernel_given_start_interpret(monkeypatch):
    """GIVEN-start (miso.c:405-409) in the fused REASSIGN kernel: each
    (event, chain) lane starts from its own psi; the deterministic
    NO_PRNG chain must match the numpy replica seeded the same way."""
    monkeypatch.setattr(pk, "_DEBUG_NO_PRNG", True)

    R, E, K, I = 16, 2, 2, 2
    rng = np.random.default_rng(5)
    read_w = (rng.random((E, R, I)) < 0.7).astype(np.float32)
    read_w[:, 0, :] = 1.0
    rls = np.where(read_w > 0, np.log(0.01 + rng.random((E, R, I))), 0.0
                   ).astype(np.float32)
    log_iso_w = np.log(np.array([[200.0, 120.0]] * E, np.float32))
    batch = EventBatch(
        weights=np.zeros((E, 4, I), np.float32),
        log_read=np.zeros((E, 4, I), np.float32),
        counts=np.zeros((E, 4), np.float32),
        log_iso_w=log_iso_w,
        hyper=np.ones((E, I), np.float32),
        num_iso=np.full((E,), I, np.int32),
        read_w=read_w,
        read_logscore=rls,
    )
    cfg = SamplerConfig(iters=24, burn_in=6, lag=3, chains=K)
    # distinct start per (event, chain): exercises the lane layout
    start = np.zeros((E, K, I), np.float32)
    p0 = np.array([[0.9, 0.3], [0.6, 0.15]], np.float32)  # (E, K)
    for e in range(E):
        for k in range(K):
            start[e, k] = [p0[e, k], 1.0 - p0[e, k]]
    out = pk.run_batch_pallas(jax.random.PRNGKey(0), batch, cfg,
                              interpret=True, start_psi=start)
    psi_s = np.asarray(out.psi_samples)
    for e in range(E):
        for k in range(K):
            sim_psi, sim_ll, sim_acc, sim_n, sim_fpsi = _sim_event(
                read_w[e].astype(np.float64), rls[e].astype(np.float64),
                log_iso_w[e].astype(np.float64),
                np.ones(I), I, cfg, R,
                start_psi=start[e, k].astype(np.float64))
            np.testing.assert_allclose(psi_s[e, :, k, :], sim_psi,
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(np.asarray(out.final_psi)[e, k],
                                       sim_fpsi, atol=2e-4)


def test_marginal_kernel_given_start_interpret(monkeypatch):
    import miso_tpu.sampler.pallas_marginal as pm
    monkeypatch.setattr(pk, "_DEBUG_NO_PRNG", True)

    E, K, C, I = 2, 2, 4, 3
    rng = np.random.default_rng(6)
    weights = rng.random((E, C, I)).astype(np.float32)
    counts = np.array([[30.0, 20.0, 10.0, 5.0]] * E, np.float32)
    batch = EventBatch(
        weights=weights,
        log_read=np.zeros((E, C, I), np.float32),
        counts=counts,
        log_iso_w=np.zeros((E, I), np.float32),
        hyper=np.ones((E, I), np.float32),
        num_iso=np.full((E,), I, np.int32),
        read_w=np.zeros((E, 1, I), np.float32),
        read_logscore=np.zeros((E, 1, I), np.float32),
    )
    cfg = SamplerConfig(iters=24, burn_in=6, lag=3, chains=K,
                        algorithm="marginal")
    start = rng.dirichlet(np.ones(I), size=(E, K)).astype(np.float32)
    out = pm.run_batch_pallas_marginal(jax.random.PRNGKey(0), batch, cfg,
                                       interpret=True, start_psi=start)
    psi_s = np.asarray(out.psi_samples)
    for e in range(E):
        for k in range(K):
            sim_psi, _, _, sim_fpsi = _sim_marginal(
                weights[e].astype(np.float64),
                counts[e].astype(np.float64), np.ones(I), I, cfg,
                start_psi=start[e, k].astype(np.float64))
            np.testing.assert_allclose(psi_s[e, :, k, :], sim_psi,
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(np.asarray(out.final_psi)[e, k],
                                       sim_fpsi, atol=2e-4)
