"""Fused Pallas TPU kernel: the complete MISO MCMC sampler in one kernel.

The pure-JAX sampler (mcmc.py) dispatches ~30 small XLA ops per MCMC
iteration; at 5000 iterations the per-op overhead dominates.  This kernel
runs the ENTIRE chain -- proposal, joint scores, MH accept, per-read
Gibbs reassignment, burn-in/lag recording -- inside one pallas_call with
all state resident in VMEM, using the on-core PRNG
(pltpu.prng_random_bits + Box-Muller for the proposal normals).

Layout: chains-in-rows.  Each of the K chains of each event in the block
is an independent ROW of the working tiles, so every operation is a
single dense 2-D op over (K*BE, R) or (K*BE, I) -- chains are never
unrolled.  Read tiles arrive per event and are broadcast K-fold across
rows once per block.  Reads sit on the 128-lane axis.

Recording: dynamic lane-axis stores must be 128-aligned in Mosaic, so
sample records live in loop-carried (K*BE, RREC) buffers written via an
iota==index select, and flush to HBM once at the end.

Semantics match sampler/mcmc.py (same reference citations:
pysplicing/src/miso.c:638-986); equivalence is statistical (different
RNG streams), verified against the grid-exact posterior oracle.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, SamplerResult

NEG_BIG = -1e30
TWO_PI = 2.0 * np.pi

# ablation switches for performance debugging (static at trace time)
import os as _os
_DEBUG_NO_RECORD = _os.environ.get("MISO_PALLAS_NO_RECORD") == "1"
_DEBUG_NO_PRNG = _os.environ.get("MISO_PALLAS_NO_PRNG") == "1"


def _u01(shape):
    """Uniform [0,1): 23-bit mantissa via bitwise AND (sign-safe)."""
    if _DEBUG_NO_PRNG:
        return jnp.full(shape, 0.4999, jnp.float32)
    bits = pltpu.prng_random_bits(shape)
    return (bits & 0x7FFFFF).astype(jnp.float32) * (2.0 ** -23)


def _normal(shape):
    """Box-Muller standard normals."""
    u1 = jnp.maximum(_u01(shape), 2.0 ** -24)
    u2 = _u01(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-38))


def _sampler_kernel(
    # scalar prefetch
    seed_ref,
    # inputs (one event block; reads flattened isoform-major)
    read_w_ref,        # (BE, I*R)
    read_logscore_ref, # (BE, I*R)
    log_iso_w_ref,     # (BE, I)
    hyper_ref,         # (BE, I)
    amask_ref,         # (BE, I)
    iso_mask_ref,      # (BE, I)
    last_onehot_ref,   # (BE, I)
    scal_ref,          # (BE, 4): noise_scale, inv_sigma, prop_const, dir_const
    # outputs
    psi_out_ref,       # (1, K*BE, I, RREC)
    loglik_out_ref,    # (1, K*BE, RREC)
    acc_out_ref,       # (1, K*BE, 1)
    finaln_out_ref,    # (1, K*BE, I)
    finalpsi_out_ref,  # (1, K*BE, I)
    *,
    cfg: SamplerConfig,
    BE: int, K: int, I: int, R: int,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    B = K * BE

    def rep(x):
        """(BE, D) -> (K*BE, D): chain-major row replication."""
        return jnp.broadcast_to(x[None], (K,) + x.shape).reshape(
            (B,) + x.shape[1:])

    amask = rep(amask_ref[:])
    iso_mask = rep(iso_mask_ref[:])
    last_onehot = rep(last_onehot_ref[:])
    log_iso_w = rep(jnp.maximum(log_iso_w_ref[:], NEG_BIG))
    hyper = rep(hyper_ref[:])
    scal = rep(scal_ref[:])
    noise_scale = scal[:, 0:1]
    inv_sigma = scal[:, 1:2]
    prop_const = scal[:, 2:3]
    dir_const = scal[:, 3:4]
    km1 = jnp.sum(amask, axis=1, keepdims=True)
    read_w = rep(read_w_ref[:])               # (B, I*R)
    read_logscore = rep(read_logscore_ref[:])

    def logistic_inv(alpha):
        e = jnp.exp(alpha) * amask
        denom = 1.0 + jnp.sum(e, axis=1, keepdims=True)
        head = e / denom
        return head + last_onehot * (1.0 - jnp.sum(head, axis=1,
                                                   keepdims=True))

    def joint_score(psi, n, read_prob):
        lp = jnp.where(iso_mask > 0, _safe_log(psi) + log_iso_w, NEG_BIG)
        mx = jnp.max(lp, axis=1, keepdims=True)
        lse = _safe_log(jnp.sum(jnp.exp(lp - mx), axis=1,
                                keepdims=True)) + mx
        ass = jnp.sum(jnp.where(n > 0, n * (lp - lse), 0.0), axis=1,
                      keepdims=True)
        dirp = jnp.sum(
            jnp.where(iso_mask > 0, (hyper - 1.0) * _safe_log(psi), 0.0),
            axis=1, keepdims=True) + dir_const
        return read_prob + ass + dirp

    def proposal_score(psi, mu_alpha):
        ltheta = jnp.sum(psi * last_onehot, axis=1, keepdims=True)
        logpsi = jnp.where(amask > 0, _safe_log(psi), 0.0)
        tmp = jnp.where(amask > 0,
                        logpsi - _safe_log(ltheta) - mu_alpha, 0.0)
        exp_part = -0.5 * jnp.sum(tmp * tmp, axis=1,
                                  keepdims=True) * inv_sigma
        return (prop_const
                - jnp.sum(logpsi, axis=1, keepdims=True)
                - _safe_log(ltheta) + exp_part)

    def gibbs(psi, compute_rp=True):
        """(B, I) psi -> (n (B, I), read_prob (B, 1)).

        read_prob cancels in the MH ratio (it depends only on the
        assignment, not psi) and is consumed only by the RECORDED
        log-likelihood -- compute_rp=False takes the cheaper
        count-difference path: read r draws isoform i iff
        cums[i-1] < u_r <= cums[i], so n_i is a difference of two
        count-of-(cums >= u) reductions and the per-read one-hot never
        materializes.  Zero-weight isoforms contribute cums[i]==cums[i-1]
        and cancel exactly; padded reads (total==0) are excluded by
        forcing u above every cumsum."""
        rws: List = []
        cums: List = []
        acc = None
        for i in range(I):
            rw_i = read_w[:, i * R:(i + 1) * R] * psi[:, i:i + 1]
            rws.append(rw_i)
            acc = rw_i if acc is None else acc + rw_i
            cums.append(acc)
        if not compute_rp:
            # u in (0, total]; padded reads get u = 1 > total = 0
            u = jnp.where(acc > 0,
                          jnp.maximum(_u01((B, R)), 2.0 ** -24) * acc, 1.0)
            n_cols = []
            prev = None
            for i in range(I):
                cnt = jnp.sum(jnp.where(cums[i] >= u, 1.0, 0.0),
                              axis=1, keepdims=True)
                n_cols.append(cnt if prev is None else cnt - prev)
                prev = cnt
            return jnp.concatenate(n_cols, axis=1), jnp.zeros(
                (B, 1), jnp.float32)
        u = _u01((B, R)) * acc
        n_cols = []
        read_prob = jnp.zeros((B, 1), jnp.float32)
        for i in range(I):
            oh = jnp.where(
                jnp.logical_and(
                    jnp.logical_and(cums[i] >= u, cums[i] - rws[i] < u),
                    rws[i] > 0),
                1.0, 0.0)
            n_cols.append(jnp.sum(oh, axis=1, keepdims=True))
            read_prob = read_prob + jnp.sum(
                oh * read_logscore[:, i * R:(i + 1) * R],
                axis=1, keepdims=True)
        return jnp.concatenate(n_cols, axis=1), read_prob

    # ---- init (miso.c:348-371 AUTO start + :834 propose + :840 gibbs)
    alpha0 = jnp.where(
        amask > 0,
        jnp.where(km1 == 1.0, 0.0, 1.0 / jnp.maximum(km1, 1.0)),
        0.0)
    alpha = alpha0 + noise_scale * _normal((B, I)) * amask
    psi = logistic_inv(alpha)
    n, rp = gibbs(psi)

    RREC = cfg.num_records
    rec_psis = [jnp.zeros((B, RREC), jnp.float32) for _ in range(I)]
    rec_ll = jnp.zeros((B, RREC), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, RREC), 1)
    acc_count = jnp.zeros((B, 1), jnp.float32)

    def step(m, alpha, psi, n, rp, acc_count, compute_rp=True):
        """One MH+Gibbs iteration; returns new state + post-accept score."""
        full = (m > 0).astype(jnp.float32)
        alpha_new = alpha + noise_scale * _normal((B, I)) * amask
        psi_new = logistic_inv(alpha_new)

        cjs = joint_score(psi, n, rp)
        pjs = joint_score(psi_new, n, rp)
        pto_c = proposal_score(psi, alpha_new)
        cto_p = proposal_score(psi_new, alpha)
        logr = (pjs - cjs) + full * (pto_c - cto_p)

        u = jnp.maximum(_u01((B, 1)), 2.0 ** -24)
        accept = jnp.where(
            jnp.logical_or(logr >= 0, jnp.log(u) < logr), 1.0, 0.0)
        psi = accept * psi_new + (1.0 - accept) * psi
        alpha = accept * alpha_new + (1.0 - accept) * alpha
        cjs_after = accept * pjs + (1.0 - accept) * cjs
        acc_count = acc_count + accept
        n, rp = gibbs(psi, compute_rp=compute_rp)
        return alpha, psi, n, rp, acc_count, cjs_after

    # Static record schedule: the record-buffer select only runs once per
    # lag block instead of every iteration (it is full-buffer traffic).
    # Records happen at m = phase-1 + lag*k for m >= burn_in where
    # phase = burn_in % lag; prologue of `phase` steps aligns blocks.
    phase = cfg.burn_in % cfg.lag
    nblocks = (cfg.iters - phase) // cfg.lag
    rec_offset = (cfg.burn_in - phase) // cfg.lag
    tail = cfg.iters - phase - nblocks * cfg.lag

    def plain_body(m, carry):
        alpha, psi, n, rp, acc_count = carry
        alpha, psi, n, rp, acc_count, _ = step(m, alpha, psi, n, rp,
                                               acc_count)
        return alpha, psi, n, rp, acc_count

    state = (alpha, psi, n, rp, acc_count)
    if phase > 0:
        state = jax.lax.fori_loop(0, phase, plain_body, state)

    def block_body(blk, carry):
        alpha, psi, n, rp, acc_count, rec_psis, rec_ll = carry
        m0 = phase + blk * cfg.lag

        def inner(j, st):
            a, p, nn, r, ac = st
            a, p, nn, r, ac, _ = step(m0 + j, a, p, nn, r, ac,
                                      compute_rp=False)
            return a, p, nn, r, ac

        # lag-2 cheap steps, then one step whose Gibbs feeds the recorded
        # score, then the record step itself
        if cfg.lag >= 2:
            alpha, psi, n, rp, acc_count = jax.lax.fori_loop(
                0, cfg.lag - 2, inner, (alpha, psi, n, rp, acc_count))
            alpha, psi, n, rp, acc_count, _ = step(
                m0 + cfg.lag - 2, alpha, psi, n, rp, acc_count,
                compute_rp=True)
        alpha, psi, n, rp, acc_count, cjs_after = step(
            m0 + cfg.lag - 1, alpha, psi, n, rp, acc_count,
            compute_rp=True)

        idx = blk - rec_offset
        idx_eff = jnp.where(idx >= 0, jnp.minimum(idx, RREC - 1), -1)
        mask = lane == idx_eff
        if _DEBUG_NO_RECORD:
            mask = lane < 0
        rec_psis = [jnp.where(mask, psi[:, i:i + 1], rec_psis[i])
                    for i in range(I)]
        rec_ll = jnp.where(mask, cjs_after, rec_ll)
        return alpha, psi, n, rp, acc_count, rec_psis, rec_ll

    alpha, psi, n, rp, acc_count, rec_psis, rec_ll = jax.lax.fori_loop(
        0, nblocks, block_body,
        state + (rec_psis, rec_ll))
    if tail > 0:
        alpha, psi, n, rp, acc_count = jax.lax.fori_loop(
            phase + nblocks * cfg.lag, cfg.iters, plain_body,
            (alpha, psi, n, rp, acc_count))

    for i in range(I):
        psi_out_ref[0, :, i, :] = rec_psis[i]
    loglik_out_ref[0] = rec_ll
    acc_out_ref[0] = acc_count
    finaln_out_ref[0] = n
    finalpsi_out_ref[0] = psi


def _block_events(E: int, R: int, K: int, I: int, RREC: int) -> int:
    """Events per grid block: replicated read tiles + record buffers +
    working temporaries must stay well under VMEM."""
    budget = 24 * 1024 * 1024
    rrec_pad = -(-RREC // 128) * 128
    per_event = K * (
        I * R * 4 * (2 + 4)             # replicated read tiles + temps
        + (I + 1) * rrec_pad * 4        # record buffers
    )
    be = max(1, budget // max(per_event, 1))
    be = min(be, E, 128)
    while E % be != 0:
        be -= 1
    return be


@functools.partial(jax.jit, static_argnames=("cfg",))
def run_batch_pallas(key, events: EventBatch,
                     cfg: SamplerConfig) -> SamplerResult:
    """Drop-in alternative to mcmc.run_batch (REASSIGN + per-read Gibbs)."""
    assert cfg.algorithm == "reassign"
    E, C, I = events.weights.shape
    R = events.read_w.shape[1]
    K = cfg.chains
    RREC = cfg.num_records
    BE = _block_events(E, R, K, I, RREC)
    NB = E // BE
    grid = (NB,)

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
    scal = jnp.stack([noise_scale, inv_sigma, prop_const, dir_const],
                     axis=1)  # (E, 4)

    # (E, R, I) -> (E, I*R), isoform-major blocks of R lanes
    read_w = jnp.swapaxes(events.read_w.astype(f32), 1, 2).reshape(E, I * R)
    read_logscore = jnp.swapaxes(
        events.read_logscore.astype(f32), 1, 2).reshape(E, I * R)

    seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, jnp.int32)

    def in_bspec(shape):
        return pl.BlockSpec((BE,) + shape,
                            lambda i, *_: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def out_bspec(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i, *_: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    KBE = K * BE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            in_bspec((I * R,)), in_bspec((I * R,)), in_bspec((I,)),
            in_bspec((I,)), in_bspec((I,)), in_bspec((I,)), in_bspec((I,)),
            in_bspec((4,)),
        ],
        out_specs=[
            out_bspec((KBE, I, RREC)), out_bspec((KBE, RREC)),
            out_bspec((KBE, 1)), out_bspec((KBE, I)), out_bspec((KBE, I)),
        ],
    )
    kernel = functools.partial(_sampler_kernel, cfg=cfg, BE=BE, K=K, I=I,
                               R=R)
    psi_s, loglik, acc, final_n, final_psi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((NB, KBE, I, RREC), f32),
            jax.ShapeDtypeStruct((NB, KBE, RREC), f32),
            jax.ShapeDtypeStruct((NB, KBE, 1), f32),
            jax.ShapeDtypeStruct((NB, KBE, I), f32),
            jax.ShapeDtypeStruct((NB, KBE, I), f32),
        ],
    )(seed, read_w, read_logscore,
      events.log_iso_w.astype(f32), events.hyper.astype(f32),
      amask, iso_mask, last_onehot, scal)

    # row k*BE + e of block b is (event b*BE+e, chain k)
    psi_samples = jnp.transpose(
        psi_s.reshape(NB, K, BE, I, RREC),
        (0, 2, 4, 1, 3)).reshape(E, RREC, K, I)
    loglik_out = jnp.transpose(
        loglik.reshape(NB, K, BE, RREC), (0, 2, 3, 1)).reshape(E, RREC, K)
    acc_ek = jnp.transpose(
        acc[:, :, 0].reshape(NB, K, BE), (0, 2, 1)).reshape(E, K)
    accepted = jnp.sum(acc_ek, axis=1).astype(jnp.int32)
    final_n_out = jnp.transpose(
        final_n.reshape(NB, K, BE, I), (0, 2, 1, 3)).reshape(E, K, I)
    final_psi_out = jnp.transpose(
        final_psi.reshape(NB, K, BE, I), (0, 2, 1, 3)).reshape(E, K, I)
    total = cfg.iters * K
    return SamplerResult(
        psi_samples=psi_samples, loglik=loglik_out,
        accepted=accepted, rejected=total - accepted,
        final_n=final_n_out, final_psi=final_psi_out,
    )
