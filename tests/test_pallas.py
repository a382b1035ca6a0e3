"""Fused Pallas sampler kernel tests.

These require a real TPU: the Mosaic interpreter in this JAX version does
not implement the on-core PRNG (prng_random_bits returns zeros), so the
kernel cannot be validated on CPU.  The driver's TPU bench exercises it
every round; this file auto-skips on CPU-only runs.
"""
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",),
    reason="Pallas sampler kernel needs a real TPU (interpreter PRNG "
           "returns zeros)")


def _compile_demo(psi, n_reads=2000, seed=42):
    from miso_tpu.core.events import compile_single_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_reads
    from miso_tpu.sampler.mcmc import EventBatch

    g = make_gene([100, 50, 100], [[1, 2, 3], [1, 3]])
    rng = np.random.default_rng(seed)
    _, pos, cig = simulate_reads(g, psi, n_reads, 25, rng)
    ev = compile_single_end(g, pos, cig, read_len=25)
    return ev


def test_pallas_matches_exact_posterior():
    from exact_posterior import exact_posterior_mean_2iso
    from miso_tpu.core.events import pad_events
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas

    ev = _compile_demo([0.7, 0.3])
    exact = exact_posterior_mean_2iso(ev)
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev] * 8).items()})
    cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=4)
    res = run_batch_pallas(jax.random.PRNGKey(0), batch, cfg)
    s = np.asarray(res.flat_samples())
    means = s[:, :, 0].mean(axis=1)
    assert np.all(np.abs(means - exact) < 0.02), (means, exact)


def test_pallas_three_isoform_agrees_with_xla():
    """3+ isoform events exercise the multi-dim proposal and the padded
    mask edge (k < I).  Guards the Mosaic carried-score freeze: broken
    kernels rejected EVERY proposal for k=3 while passing k=2 (see
    docs/VALIDATION.md), so acceptance agreement is asserted too."""
    from miso_tpu.core.events import compile_single_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_reads
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas
    from miso_tpu.sampler.pallas_marginal import run_batch_pallas_marginal

    g3 = make_gene([100, 50, 80, 100], [[1, 2, 3, 4], [1, 3, 4], [1, 4]])
    _, pos, cig = simulate_reads(g3, [0.5, 0.3, 0.2], 3000, 25,
                                 np.random.default_rng(7))
    for algo, runner in (("reassign", run_batch_pallas),
                         ("marginal", run_batch_pallas_marginal)):
        ev = compile_single_end(g3, pos, cig, read_len=25, algorithm=algo)
        batch = EventBatch(**{k: np.asarray(v)
                              for k, v in pad_events([ev] * 8).items()})
        cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=4,
                            algorithm=algo)
        r1 = runner(jax.random.PRNGKey(2), batch, cfg)
        r2 = run_batch(jax.random.PRNGKey(3), batch, cfg)
        m1 = np.asarray(r1.flat_samples())[0].mean(axis=0)
        m2 = np.asarray(r2.flat_samples())[0].mean(axis=0)
        assert np.all(np.abs(m1 - m2) < 0.03), (algo, m1, m2)
        a1 = float(r1.accepted[0]) / (cfg.iters * cfg.chains)
        a2 = float(r2.accepted[0]) / (cfg.iters * cfg.chains)
        assert abs(a1 - a2) < 0.06, (algo, a1, a2)
        assert a1 > 0.05, (algo, "chain frozen", a1)


def test_pallas_marginal_agrees_with_xla():
    """Fused MARGINAL/CLASSES kernel: posterior means and acceptance rate
    match the XLA scan sampler (which matches the grid-exact posterior of
    the collapsed model in test_sampler.py)."""
    from miso_tpu.core.events import compile_single_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_reads
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch
    from miso_tpu.sampler.pallas_marginal import run_batch_pallas_marginal

    g = make_gene([100, 50, 100], [[1, 2, 3], [1, 3]])
    rng = np.random.default_rng(42)
    _, pos, cig = simulate_reads(g, [0.7, 0.3], 2000, 25, rng)
    for algo in ("marginal", "classes"):
        ev = compile_single_end(g, pos, cig, read_len=25, algorithm=algo)
        batch = EventBatch(**{k: np.asarray(v)
                              for k, v in pad_events([ev] * 8).items()})
        cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=4,
                            algorithm=algo)
        r1 = run_batch_pallas_marginal(jax.random.PRNGKey(0), batch, cfg)
        r2 = run_batch(jax.random.PRNGKey(1), batch, cfg)
        m1 = np.asarray(r1.flat_samples())[:, :, 0].mean(axis=1)
        m2 = float(np.asarray(r2.flat_samples())[:, :, 0].mean())
        assert np.all(np.abs(m1 - m2) < 0.025), (algo, m1, m2)
        a1 = float(r1.accepted[0]) / (cfg.iters * cfg.chains)
        a2 = float(r2.accepted[0]) / (cfg.iters * cfg.chains)
        # also guards the TPU matmul-precision fix in score_marginal
        # (bf16 MXU noise dropped XLA acceptance from 0.84 to 0.24)
        assert abs(a1 - a2) < 0.05, (algo, a1, a2)


def test_pallas_agrees_with_xla_sampler():
    from miso_tpu.core.events import pad_events
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas

    ev = _compile_demo([0.4, 0.6], seed=3)
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev]).items()})
    cfg = SamplerConfig(iters=1200, burn_in=300, lag=5, chains=4)
    r1 = run_batch_pallas(jax.random.PRNGKey(0), batch, cfg)
    r2 = run_batch(jax.random.PRNGKey(0), batch, cfg)
    m1 = float(np.asarray(r1.flat_samples())[0, :, 0].mean())
    m2 = float(np.asarray(r2.flat_samples())[0, :, 0].mean())
    assert abs(m1 - m2) < 0.02, (m1, m2)
    a1 = float(r1.accepted[0]) / (float(r1.accepted[0]) + float(r1.rejected[0]))
    a2 = float(r2.accepted[0]) / (float(r2.accepted[0]) + float(r2.rejected[0]))
    assert abs(a1 - a2) < 0.05, (a1, a2)


def test_pallas_given_start_matches_exact_posterior():
    """GIVEN-start (miso.c:405-409): starting every chain from a
    deliberately wrong psi must still converge to the exact posterior --
    validates the kernel's start-psi input end to end on hardware."""
    from exact_posterior import exact_posterior_mean_2iso
    from miso_tpu.core.events import pad_events
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas

    ev = _compile_demo([0.7, 0.3])
    exact = exact_posterior_mean_2iso(ev)
    E, K = 8, 4
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev] * E).items()})
    cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=K)
    start = np.tile(np.array([0.05, 0.95], np.float32), (E, K, 1))
    res = run_batch_pallas(jax.random.PRNGKey(3), batch, cfg,
                           start_psi=start)
    s = np.asarray(res.flat_samples())
    means = s[:, :, 0].mean(axis=1)
    assert np.all(np.abs(means - exact) < 0.03), (means, exact)


def test_pallas_marginal_given_start():
    from miso_tpu.core.events import compile_single_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_reads
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig
    from miso_tpu.sampler.pallas_marginal import run_batch_pallas_marginal

    g = make_gene([100, 50, 100], [[1, 2, 3], [1, 3]])
    rng = np.random.default_rng(9)
    _, pos, cig = simulate_reads(g, [0.6, 0.4], 2000, 25, rng)
    ev = compile_single_end(g, pos, cig, read_len=25, algorithm="marginal")
    # grid-exact mean of the MARGINAL-algorithm target, which is a
    # different likelihood from REASSIGN's: prod_c (sum_j W_cj psi_j)^n_c
    # with W = compat/effLen (miso.c:807-815) -- NOT the reassign model's
    # length-normalized mixture, so exact_posterior_mean_2iso does not
    # apply here
    p = np.linspace(1e-6, 1 - 1e-6, 200001)
    W = ev.weights[:, :2]
    s = W[None, :, 0] * p[:, None] + W[None, :, 1] * (1 - p)[:, None]
    ll = np.where(ev.counts[None, :] > 0,
                  ev.counts[None, :] * np.log(np.maximum(s, 1e-300)),
                  0.0).sum(axis=1)
    w = np.exp(ll - ll.max())
    exact = float((w * p).sum() / w.sum())
    E, K = 8, 4
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev] * E).items()})
    cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=K,
                        algorithm="marginal")
    start = np.tile(np.array([0.95, 0.05], np.float32), (E, K, 1))
    res = run_batch_pallas_marginal(jax.random.PRNGKey(4), batch, cfg,
                                    start_psi=start)
    s = np.asarray(res.flat_samples())
    means = s[:, :, 0].mean(axis=1)
    assert np.all(np.abs(means - exact) < 0.03), (means, exact)


def test_production_mesh_shard_map_on_chip():
    """On TPU, resolve_mesh returns a mesh even for one chip, so
    production `miso --run` executes the SAME shard_map+Pallas branch a
    multi-chip host would (parallel/mesh.py:run_batch_sharded); the
    posterior must match the grid-exact oracle."""
    from exact_posterior import exact_posterior_mean_2iso
    from miso_tpu.core.events import pad_events
    from miso_tpu.parallel.mesh import run_batch_sharded
    from miso_tpu.pipeline import resolve_mesh
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig

    mesh = resolve_mesh("auto")
    assert mesh is not None, "TPU hosts must always run the mesh path"
    ev = _compile_demo([0.4, 0.6])
    exact = exact_posterior_mean_2iso(ev)
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev] * 8).items()})
    cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=4)
    res = run_batch_sharded(jax.random.PRNGKey(3), batch, cfg,
                            mesh=mesh, backend="pallas")
    s = np.asarray(res.flat_samples())[:8]
    means = s[:, :, 0].mean(axis=1)
    assert np.all(np.abs(means - exact) < 0.02), (means, exact)

def test_pallas_paired_agrees_with_xla():
    """Paired-end events through the fused REASSIGN kernel: fragment-
    length-probability weights (not {0,1}) and assscores isoform terms
    (miso_paired.c:241-574 semantics) must sample the same posterior as
    the XLA scan (whose paired path matches the grid-exact posterior in
    test_sampler.py)."""
    from miso_tpu.core.events import compile_paired_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_paired_reads
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas

    g = make_gene([600, 100, 600], [[1, 2, 3], [1, 3]])
    rng = np.random.default_rng(11)
    _, pos, cig = simulate_paired_reads(g, [0.6, 0.4], 400, 40, 250.0,
                                        15.0 ** 2, rng=rng)
    ev = compile_paired_end(g, pos, cig, read_len=40, mean_frag_len=250.0,
                            frag_variance=15.0 ** 2)
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev] * 8).items()})
    cfg = SamplerConfig(iters=1500, burn_in=300, lag=5, chains=4)
    r1 = run_batch_pallas(jax.random.PRNGKey(4), batch, cfg)
    r2 = run_batch(jax.random.PRNGKey(5), batch, cfg)
    m1 = np.asarray(r1.flat_samples())[:, :, 0].mean(axis=1)
    m2 = float(np.asarray(r2.flat_samples())[:, :, 0].mean())
    assert np.all(np.abs(m1 - m2) < 0.025), (m1, m2)
    a1 = float(r1.accepted[0]) / (cfg.iters * cfg.chains)
    a2 = float(r2.accepted[0]) / (cfg.iters * cfg.chains)
    assert abs(a1 - a2) < 0.06, (a1, a2)
    assert a1 > 0.05, ("chain frozen", a1)
