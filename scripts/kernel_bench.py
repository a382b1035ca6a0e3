"""Focused REASSIGN-kernel micro-bench: one I=2 bucket, production cost.

Times ONLY the fused Pallas kernel on the dominant bucket shape of the
production bench (I=2, R=224, 5000 iters x 6 chains) so kernel variants
can be compared without paying the full bench.py catalog compile.

Usage: python scripts/kernel_bench.py [num_events] [algorithm]
       python scripts/kernel_bench.py [num_events] --paired
  (--paired times the production paired-end bucket shape: fragment-
   length-probability weights, classes~128, the e2e-paired fixture's
   150 pairs/event at read_len 40, mean 250 sd 15)
Env ablations (read by sampler/pallas_kernel.py at import):
  MISO_PALLAS_NO_PRNG=1   constant-uniform chain (PRNG share)
  MISO_PALLAS_NO_RECORD=1 no sample staging (record share)
  MISO_PALLAS_PRNG32=1    23-bit Gibbs uniforms (default is 16-bit)
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from miso_tpu.core.events import compile_single_end, pad_events
    from miso_tpu.core.gene import make_gene
    from miso_tpu.core.simulate import simulate_reads
    from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig
    from miso_tpu.sampler.pallas_kernel import run_batch_pallas

    paired = "--paired" in sys.argv
    if paired:
        sys.argv.remove("--paired")
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    protos = []
    if paired:
        from miso_tpu.core.events import compile_paired_end
        from miso_tpu.core.simulate import simulate_paired_reads
        g = make_gene([600, 100, 600], [[1, 2, 3], [1, 3]])
        for _ in range(8):
            psi = rng.dirichlet(np.ones(2))
            _, pos, cig = simulate_paired_reads(
                g, psi, 150, 40, 250.0, 15.0 ** 2, rng=rng)
            protos.append(compile_paired_end(
                g, pos, cig, read_len=40, mean_frag_len=250.0,
                frag_variance=15.0 ** 2))
    else:
        g = make_gene([100, 50, 100], [[1, 2, 3], [1, 3]])
        for _ in range(8):
            psi = rng.dirichlet(np.ones(2))
            _, pos, cig = simulate_reads(g, psi, 200, 25, rng)
            protos.append(compile_single_end(g, pos, cig, read_len=25))
    events = [protos[i % len(protos)] for i in range(E)]
    pad = pad_events(events, pad_iso=2)
    batch = EventBatch(**{k: np.asarray(v) for k, v in pad.items()})
    cfg = SamplerConfig(iters=5000, burn_in=500, lag=10, chains=6)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    np.asarray(run_batch_pallas(key, batch, cfg).accepted)
    print("compile+run: %.2fs  (C pad = %d, R pad = %d)"
          % (time.perf_counter() - t0, batch.weights.shape[1],
             batch.read_w.shape[1]))
    dt = float("inf")
    for rep in range(5):
        t0 = time.perf_counter()
        res = run_batch_pallas(jax.random.PRNGKey(1 + rep), batch, cfg)
        np.asarray(res.accepted)
        dt = min(dt, time.perf_counter() - t0)
    flags = {k: v for k, v in os.environ.items() if k.startswith("MISO_")}
    print("kernel: %d events in %.3fs = %.0f events/s  %s"
          % (E, dt, E / dt, flags))


if __name__ == "__main__":
    main()
