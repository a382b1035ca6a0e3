"""Fused Pallas TPU kernel for the MARGINAL / CLASSES algorithms.

The collapsed algorithms (pysplicing/src/miso.c:807-815 MARGINAL,
:790-803 CLASSES; selected by SPLICING_ALGO_* in splicing.h:59-62) have no
per-read Gibbs step: the read term of the joint score is
``sum_c counts_c * log(sum_i W_ci psi_i)`` over C collapsed classes
(miso.c:272-293), so one MCMC iteration is O(C*I) instead of O(R*I).
This kernel fuses the whole chain -- proposal, marginal score, MH accept,
burn-in/lag recording -- with every working tensor in VMEM.

Layout: TRANSPOSED, lanes = (event, chain) rows.  The model axes
(isoforms I, classes C) are tiny (4-8), so putting them on the 128-lane
axis wastes 94-97% of every vector register; instead they live on the
SUBLANE axis and the massively-parallel (event*chain) axis fills the
lanes.  Every elementwise op then runs on dense (I, B)/(C, B) tiles --
measured ~5x faster than the row-major variant of this same kernel.
Chain replication (lane index = event*K + chain) happens host-side: the
per-event tensors are O(I*C) so the replicated copies are ~MBs.

Records land in a 128-sublane staging tile (iota-mask select) that
flushes to the output block at STATIC sublane offsets -- one flush per
128 records.  All score pieces are recomputed from psi each iteration:
carrying them across fori_loop iterations is mathematically identical
but froze 3-isoform chains under Mosaic (see docs/VALIDATION.md).

Semantics match sampler/mcmc.py run_batch(algorithm='marginal'|'classes');
equivalence is statistical (different RNG streams), verified against the
grid-exact posterior oracle in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, SamplerResult
from miso_tpu.sampler import pallas_kernel as _pk
from miso_tpu.sampler.pallas_kernel import _normal, _safe_log, _u01

NEG_BIG = -1e30


def _marginal_kernel(
    # scalar prefetch
    seed_ref,
    # inputs (one event block; lane = local_event*K + chain)
    w_ref,           # (I, C, B) class weights
    counts_ref,      # (C, B) reads per class
    hyper_ref,       # (I, B)
    amask_ref,       # (I, B)
    iso_mask_ref,    # (I, B)
    last_onehot_ref, # (I, B)
    scal_ref,        # (4, B): noise_scale, inv_sigma, prop_const, dir_const
    # with has_start, one extra input (start psi, (I, B)) precedes the
    # outputs (psi_out, loglik_out, acc_out, finalpsi_out)
    *refs,
    cfg: SamplerConfig,
    B: int, I: int, C: int,
    has_start: bool = False,
):
    if has_start:
        start_ref = refs[0]
        refs = refs[1:]
    else:
        start_ref = None
    psi_out_ref, loglik_out_ref, acc_out_ref, finalpsi_out_ref = refs
    if not _pk._DEBUG_NO_PRNG:  # no interpret rule for prng_seed on CPU
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    w_iso = [w_ref[i] for i in range(I)]   # I x (C, B)
    counts = counts_ref[:]
    amask = amask_ref[:]
    iso_mask = iso_mask_ref[:]
    last_onehot = last_onehot_ref[:]
    hyper = hyper_ref[:]
    noise_scale = scal_ref[0:1]
    inv_sigma = scal_ref[1:2]
    prop_const = scal_ref[2:3]
    dir_const = scal_ref[3:4]

    def logistic_inv(alpha):
        e = jnp.exp(alpha) * amask
        denom = 1.0 + jnp.sum(e, axis=0, keepdims=True)
        head = e / denom
        return head + last_onehot * (1.0 - jnp.sum(head, axis=0,
                                                   keepdims=True))

    def joint_score(psi):
        """Marginal read term (miso.c:272-293) + Dirichlet prior."""
        s = None
        for i in range(I):
            term = w_iso[i] * psi[i:i + 1]
            s = term if s is None else s + term
        read_term = jnp.sum(
            jnp.where(s > 0, counts * _safe_log(s), 0.0),
            axis=0, keepdims=True)
        dirp = jnp.sum(
            jnp.where(iso_mask > 0, (hyper - 1.0) * _safe_log(psi), 0.0),
            axis=0, keepdims=True) + dir_const
        return read_term + dirp

    def proposal_score(psi, mu_alpha):
        ltheta = jnp.sum(psi * last_onehot, axis=0, keepdims=True)
        logpsi = jnp.where(amask > 0, _safe_log(psi), 0.0)
        tmp = jnp.where(amask > 0,
                        logpsi - _safe_log(ltheta) - mu_alpha, 0.0)
        exp_part = -0.5 * jnp.sum(tmp * tmp, axis=0,
                                  keepdims=True) * inv_sigma
        return (prop_const
                - jnp.sum(logpsi, axis=0, keepdims=True)
                - _safe_log(ltheta) + exp_part)

    # ---- init (miso.c:348-371 AUTO start + :834 initial proposal);
    # with has_start, the GIVEN start (miso.c:405-409)
    km1 = jnp.sum(amask, axis=0, keepdims=True)
    if start_ref is not None:
        sp = start_ref[:]
        sp_last = jnp.sum(sp * last_onehot, axis=0, keepdims=True)
        alpha0 = jnp.where(
            amask > 0,
            _safe_log(jnp.maximum(sp, 1e-30))
            - _safe_log(jnp.maximum(sp_last, 1e-30)),
            0.0)
    else:
        alpha0 = jnp.where(
            amask > 0,
            jnp.where(km1 == 1.0, 0.0, 1.0 / jnp.maximum(km1, 1.0)),
            0.0)
    alpha = alpha0 + noise_scale * _normal((I, B)) * amask
    psi = logistic_inv(alpha)
    cjs = joint_score(psi)
    acc_count = jnp.zeros((1, B), jnp.float32)

    # NOTE: cjs is recomputed from psi every iteration even though the
    # carried value is mathematically identical.  Carrying it (and/or
    # log psi) froze 3-isoform chains under Mosaic -- every proposal
    # rejected from iteration 0 with bit-identical symptoms in two
    # different kernels -- while the recompute form is correct.  See
    # docs/VALIDATION.md "carried score pieces" note.
    def step(m, alpha, psi, cjs, acc_count):
        full = (m > 0).astype(jnp.float32)
        alpha_new = alpha + noise_scale * _normal((I, B)) * amask
        psi_new = logistic_inv(alpha_new)
        cjs = joint_score(psi)
        pjs = joint_score(psi_new)
        pto_c = proposal_score(psi, alpha_new)
        cto_p = proposal_score(psi_new, alpha)
        logr = (pjs - cjs) + full * (pto_c - cto_p)
        u = jnp.maximum(_u01((1, B)), 2.0 ** -24)
        accept = jnp.where(
            jnp.logical_or(logr >= 0, jnp.log(u) < logr), 1.0, 0.0)
        rej = 1.0 - accept
        psi = accept * psi_new + rej * psi
        alpha = accept * alpha_new + rej * alpha
        cjs = accept * pjs + rej * cjs
        return alpha, psi, cjs, acc_count + accept

    def plain_body(m, carry):
        return step(m, *carry)

    # Record schedule (matches mcmc.py): burn_in steps, then a record after
    # every `lag` steps.  phase aligns blocks; rec_offset blocks precede
    # the first record.
    phase = cfg.burn_in % cfg.lag
    nblocks = (cfg.iters - phase) // cfg.lag
    rec_offset = (cfg.burn_in - phase) // cfg.lag
    RREC = cfg.num_records
    tail_start = phase + nblocks * cfg.lag

    state = (alpha, psi, cjs, acc_count)
    pre = phase + rec_offset * cfg.lag
    if pre > 0:
        state = jax.lax.fori_loop(0, pre, plain_body, state)

    sub = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0)
    nchunks = -(-RREC // 128)
    for chunk in range(nchunks):
        n_in_chunk = min(128, RREC - chunk * 128)
        stage_psi = [jnp.zeros((128, B), jnp.float32) for _ in range(I)]
        stage_ll = jnp.zeros((128, B), jnp.float32)

        def chunk_body(blk, carry, chunk=chunk):
            st = carry[:-2]
            stage_psi, stage_ll = carry[-2], carry[-1]
            m0 = pre + (chunk * 128 + blk) * cfg.lag

            def inner(j, s):
                return step(m0 + j, *s)

            st = jax.lax.fori_loop(0, cfg.lag, inner, st)
            psi, cjs = st[1], st[2]
            mask = sub == blk
            stage_psi = [jnp.where(mask, psi[i:i + 1], stage_psi[i])
                         for i in range(I)]
            stage_ll = jnp.where(mask, cjs, stage_ll)
            return st + (stage_psi, stage_ll)

        carry = jax.lax.fori_loop(0, n_in_chunk, chunk_body,
                                  state + (stage_psi, stage_ll))
        state = carry[:-2]
        stage_psi, stage_ll = carry[-2], carry[-1]
        lo, hi = chunk * 128, (chunk + 1) * 128
        for i in range(I):
            psi_out_ref[0, i, lo:hi, :] = stage_psi[i]
        loglik_out_ref[0, lo:hi, :] = stage_ll

    if tail_start < cfg.iters:
        state = jax.lax.fori_loop(tail_start, cfg.iters, plain_body, state)

    acc_out_ref[0] = state[3]
    finalpsi_out_ref[0] = state[1]


def _block_events(E: int, K: int, I: int, RPAD: int) -> int:
    """Events per grid block: the dominant VMEM term is the per-block
    output records (K*(I+1)*RPAD floats per event) + staging tiles.
    Prefer BE with B = K*BE a multiple of 128 (dense lane tiles)."""
    budget = 24 * 1024 * 1024
    per_event = K * 4 * ((I + 1) * RPAD + (I + 1) * 128 * 2 + 16 * I)
    be = max(1, min(budget // max(per_event, 1), E, 512))
    # legal blocks only (lane width a multiple of 128, or the whole
    # array) -- see pallas_kernel._block_events
    legal = [c for c in range(1, E + 1)
             if E % c == 0 and ((c * K) % 128 == 0 or c == E)]
    within = [c for c in legal if c <= be]
    return max(within) if within else min(legal)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def run_batch_pallas_marginal(key, events: EventBatch,
                              cfg: SamplerConfig,
                              interpret: bool = False,
                              start_psi=None) -> SamplerResult:
    """Drop-in alternative to mcmc.run_batch for MARGINAL / CLASSES.

    Optional `start_psi` (E, K, I) selects the GIVEN chain start
    (miso.c:405-409), used by convergent-mean continuations and the
    NNLS linear start.

    interpret=True + MISO_PALLAS_NO_PRNG runs the deterministic chain in
    the Pallas interpreter on CPU (tests/test_pallas_interpret.py)."""
    assert cfg.algorithm in ("marginal", "classes")
    E, C, I = events.weights.shape
    K = cfg.chains
    RREC = cfg.num_records
    RPAD = -(-RREC // 128) * 128
    BE = _block_events(E, K, I, RPAD)
    NB = E // BE
    B = K * BE

    f32 = jnp.float32
    num_iso = events.num_iso.astype(jnp.int32)
    ar = jnp.arange(I)[None, :]
    iso_mask = (ar < num_iso[:, None]).astype(f32)
    amask = (ar < (num_iso[:, None] - 1)).astype(f32)
    last_onehot = (ar == (num_iso[:, None] - 1)).astype(f32)
    kf = num_iso.astype(f32)
    sigma = 0.2 / (kf * kf)
    noise_scale = jnp.where(num_iso == 2, sigma, jnp.sqrt(sigma))
    inv_sigma = 1.0 / sigma
    prop_const = -0.5 * (kf - 1.0) * jnp.log(2.0 * np.pi * sigma)
    h = jnp.where(iso_mask > 0, events.hyper.astype(f32), 1.0)
    dir_const = (gammaln(jnp.sum(jnp.where(iso_mask > 0, h, 0.0), axis=1))
                 - jnp.sum(jnp.where(iso_mask > 0, gammaln(h), 0.0), axis=1))
    scal = jnp.stack([noise_scale, inv_sigma, prop_const, dir_const], axis=1)

    def to_lanes(x):
        """(E, ...) -> (..., E*K): lane index = event*K + chain."""
        x = jnp.repeat(x, K, axis=0)               # (E*K, ...)
        return jnp.moveaxis(x, 0, -1)

    w_t = to_lanes(jnp.swapaxes(events.weights.astype(f32), 1, 2))  # (I,C,EK)
    counts_t = to_lanes(events.counts.astype(f32))                  # (C, EK)
    hyper_t = to_lanes(h)
    amask_t = to_lanes(amask)
    iso_mask_t = to_lanes(iso_mask)
    last_onehot_t = to_lanes(last_onehot)
    scal_t = to_lanes(scal)

    seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, jnp.int32)

    def in_bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (B,),
                            lambda i, *_: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    def out_bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape + (B,),
                            lambda i, *_: (i,) + (0,) * nd + (0,),
                            memory_space=pltpu.VMEM)

    has_start = start_psi is not None
    inputs = [seed, w_t, counts_t, hyper_t, amask_t, iso_mask_t,
              last_onehot_t, scal_t]
    in_specs = [
        in_bspec((I, C)), in_bspec((C,)), in_bspec((I,)),
        in_bspec((I,)), in_bspec((I,)), in_bspec((I,)), in_bspec((4,)),
    ]
    if has_start:
        sp = jnp.asarray(start_psi, f32).reshape(E * K, I)
        inputs.append(jnp.moveaxis(sp, 0, -1))
        in_specs.append(in_bspec((I,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=[
            out_bspec((I, RPAD)), out_bspec((RPAD,)),
            out_bspec((1,)), out_bspec((I,)),
        ],
    )
    kernel = functools.partial(_marginal_kernel, cfg=cfg, B=B, I=I, C=C,
                               has_start=has_start)
    psi_s, loglik, acc, final_psi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((NB, I, RPAD, B), f32),
            jax.ShapeDtypeStruct((NB, RPAD, B), f32),
            jax.ShapeDtypeStruct((NB, 1, B), f32),
            jax.ShapeDtypeStruct((NB, I, B), f32),
        ],
    )(*inputs)

    # lane b*B + e*K + k is (event b*BE+e, chain k)
    psi_samples = jnp.transpose(
        psi_s[:, :, :RREC, :].reshape(NB, I, RREC, BE, K),
        (0, 3, 2, 4, 1)).reshape(E, RREC, K, I)
    loglik_out = jnp.transpose(
        loglik[:, :RREC, :].reshape(NB, RREC, BE, K),
        (0, 2, 1, 3)).reshape(E, RREC, K)
    acc_ek = acc[:, 0, :].reshape(NB, BE, K).reshape(E, K)
    accepted = jnp.sum(acc_ek, axis=1).astype(jnp.int32)
    final_psi_out = jnp.transpose(
        final_psi.reshape(NB, I, BE, K), (0, 2, 3, 1)).reshape(E, K, I)
    total = cfg.iters * K
    return SamplerResult(
        psi_samples=psi_samples, loglik=loglik_out,
        accepted=accepted, rejected=total - accepted,
        final_n=jnp.zeros((E, K, I), f32), final_psi=final_psi_out,
    )
