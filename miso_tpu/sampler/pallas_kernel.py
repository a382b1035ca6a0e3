"""Fused Pallas TPU kernel: the complete MISO MCMC sampler in one kernel.

The pure-JAX sampler (mcmc.py) dispatches ~30 small XLA ops per MCMC
iteration; at 5000 iterations the per-op overhead dominates.  This kernel
runs the ENTIRE chain -- proposal, joint scores, MH accept, per-read
Gibbs reassignment, burn-in/lag recording -- inside one pallas_call with
all state resident in VMEM, using the on-core PRNG
(pltpu.prng_random_bits + Box-Muller for the proposal normals).

Layout: TRANSPOSED, lanes = (event, chain) rows.  The model axes are
small (I isoforms, R reads), so the massively-parallel (event*chain)
axis fills the 128-lane dimension and every elementwise op runs on dense
(I, B) / (R, B) tiles.  The row-major variant of this same kernel (rows
on sublanes, reads on lanes) ran the I-wide proposal/score math at 4/128
lane occupancy -- measured 2.4x slower end to end.  Chain replication
(lane index = event*K + chain) happens host-side.

Gibbs reassignment is inverse-CDF with a count-difference reduction:
read r draws isoform i iff cums[i-1] < u_r <= cums[i], so the one-hot is
ge_i - ge_{i-1} (zero-weight isoforms give ge_i == ge_{i-1} and cancel
exactly); on non-recorded iterations only the per-isoform counts are
reduced.  Padded reads (total weight 0) are excluded by forcing u above
every cumsum.

Recording: samples land in a 128-sublane staging tile (iota-mask select)
flushed to the output block at STATIC sublane offsets, one flush per 128
records; the read-score reduction (cancels in the MH ratio) runs only on
the iteration feeding each recorded score.

Semantics match sampler/mcmc.py (same reference citations:
pysplicing/src/miso.c:638-986); equivalence is statistical (different
RNG streams), verified against the grid-exact posterior oracle.
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

NEG_BIG = -1e30
TWO_PI = 2.0 * np.pi

# ablation switches for performance debugging (static at trace time)
import os as _os
_DEBUG_NO_RECORD = _os.environ.get("MISO_PALLAS_NO_RECORD") == "1"
_DEBUG_NO_PRNG = _os.environ.get("MISO_PALLAS_NO_PRNG") == "1"
_PRNG16 = _os.environ.get("MISO_PALLAS_PRNG32") != "1"


def _u01(shape):
    """Uniform [0,1): 23-bit mantissa via bitwise AND (sign-safe)."""
    if _DEBUG_NO_PRNG:
        return jnp.full(shape, 0.4999, jnp.float32)
    bits = pltpu.prng_random_bits(shape)
    return (bits & 0x7FFFFF).astype(jnp.float32) * (2.0 ** -23)


def _u01_reads(R, B):
    """(R, B) uniforms in (0, 1) for the per-read Gibbs draws.

    16-bit resolution: two reads share one int32 from the on-core PRNG,
    halving the per-iteration bit generation.  Pinning the low bit
    leaves 15 free bits, so the category boundaries quantize at 2^-15
    -- per-read assignment bias <= 2^-15, far below the Monte-Carlo
    noise floor (validated against the grid-exact posterior oracle,
    tests/test_pallas.py).  The MH-accept and
    Box-Muller draws stay 23-bit (they feed log()).

    The |1 pins the low bit so u > 0 strictly: a u == 0 draw would land
    reads on leading zero-weight isoforms (cums == 0 >= 0), and folding
    the guard into the integer mask saves the separate maximum() pass
    over the (R, B) tile."""
    if _DEBUG_NO_PRNG:
        return jnp.full((R, B), 0.4999, jnp.float32)
    if not _PRNG16 or R < 2:
        bits = pltpu.prng_random_bits((R, B))
        return ((bits & 0x7FFFFE) | 1).astype(jnp.float32) * (2.0 ** -23)
    H = (R + 1) // 2
    bits = pltpu.prng_random_bits((H, B))
    # arithmetic >> floods the sign bit on int32; the & masks it off
    u = jnp.concatenate([(bits & 0xFFFE) | 1,
                         (bits >> 16) & 0xFFFF | 1], axis=0)
    u = u.astype(jnp.float32) * (2.0 ** -16)
    return u if 2 * H == R else u[:R]


def _normal(shape):
    """Box-Muller standard normals."""
    u1 = jnp.maximum(_u01(shape), 2.0 ** -24)
    u2 = _u01(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _normal_rows(I, B):
    """(I, B) standard normals using BOTH Box-Muller outputs: the
    cos/sin pair shares one radius, halving the PRNG + log + sqrt work
    versus generating I rows of cos-only draws."""
    if I == 1:
        return _normal((1, B))
    H = (I + 1) // 2
    u1 = jnp.maximum(_u01((H, B)), 2.0 ** -24)
    u2 = _u01((H, B))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)
    return z if 2 * H == I else z[:I]


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-38))


def _sampler_kernel(
    # scalar prefetch
    seed_ref,
    # inputs (one event block; lane = local_event*K + chain)
    read_w_ref,        # (I, R, B)
    read_logscore_ref, # (I, R, B)
    log_iso_w_ref,     # (I, B)
    hyper_ref,         # (I, B)
    amask_ref,         # (I, B)
    iso_mask_ref,      # (I, B)
    last_onehot_ref,   # (I, B)
    scal_ref,          # (2, B): noise_scale, dir_const
    # with has_start, one extra input (start psi, (I, B)) precedes the
    # outputs (psi_out, loglik_out, acc_out, finaln_out, finalpsi_out)
    *refs,
    cfg: SamplerConfig,
    B: int, I: int, R: int,
    has_start: bool = False,
):
    if has_start:
        start_ref = refs[0]
        refs = refs[1:]
    else:
        start_ref = None
    (psi_out_ref, loglik_out_ref, acc_out_ref, finaln_out_ref,
     finalpsi_out_ref) = refs
    if not _DEBUG_NO_PRNG:  # no interpret rule for prng_seed on CPU
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    read_w_plain = [read_w_ref[i] for i in range(I)]   # I x (R, B)

    def read_w_i(i):
        return read_w_plain[i]

    read_ls = [read_logscore_ref[i] for i in range(I)]
    amask = amask_ref[:]
    iso_mask = iso_mask_ref[:]
    last_onehot = last_onehot_ref[:]
    log_iso_w = jnp.maximum(log_iso_w_ref[:], NEG_BIG)
    hyper = hyper_ref[:]
    noise_scale = scal_ref[0:1]
    dir_const = scal_ref[1:2]
    km1 = jnp.sum(amask, axis=0, keepdims=True)
    kk = km1 + 1.0

    # ---- static per-block score pieces.  ALL score math runs in alpha
    # space: with e = exp(alpha) (head isoforms) and denom = 1 + sum(e),
    #   psi_i     = e_i / denom        (last isoform: 1 / denom)
    #   log psi_i = alpha_aug_i - log(denom)   [alpha_aug: alpha, last = 0]
    # so the only transcendentals per iteration are ONE (I, B) exp and two
    # (1, B) logs -- the psi-space form (miso.c:97-307) needs ~10 (I, B)
    # log/exp passes for identical values.
    eiw = jnp.exp(log_iso_w) * iso_mask                # effective lengths
    a_liw = jnp.where(iso_mask > 0, log_iso_w, 0.0)
    h1 = jnp.where(iso_mask > 0, hyper - 1.0, 0.0)
    H1 = jnp.sum(h1, axis=0, keepdims=True)

    def stats(alpha):
        """alpha (I, B) -> (psi, log denom, log S) with
        S = sum_i psi_i * efflen_i * denom (the assignment-score
        normalizer sum(exp(log psi + log_iso_w)) times denom)."""
        e = jnp.exp(alpha) * amask
        denom = 1.0 + jnp.sum(e, axis=0, keepdims=True)
        ld = _safe_log(denom)
        e_aug = e + last_onehot
        psi = e_aug / denom
        logS = _safe_log(jnp.sum(e_aug * eiw, axis=0, keepdims=True))
        return psi, ld, logS

    def joint_abs(alpha, ld, logS, n, rp, n_valid):
        """Absolute joint score splicing_score_joint (miso.c:243-307) of
        the current state, for RECORDED log-likelihoods only.
        lp_i - lse = alpha_aug_i + log_iso_w_i - logS (the log-denom
        cancels); sum_i n_i = n_valid."""
        a_aug = alpha * amask
        t = jnp.sum((n + h1) * a_aug + n * a_liw, axis=0, keepdims=True)
        return rp + t - n_valid * logS - H1 * ld + dir_const

    # Read validity is STATIC per (read, lane): psi of real isoforms is
    # strictly positive, so total weight > 0 iff any compatible isoform
    # has nonzero weight.  Every valid read is always assigned, so the
    # last isoform's one-hot/count telescopes from the total.
    valid_sum = read_w_i(0)
    for i in range(1, I):
        valid_sum = valid_sum + read_w_i(i)
    valid_f = jnp.where(valid_sum > 0, 1.0, 0.0)          # (R, B)
    n_valid = jnp.sum(valid_f, axis=0, keepdims=True)     # (1, B)
    n_pad = float(R) - n_valid                            # (1, B) static

    def gibbs(psi, compute_rp=True):
        """(I, B) psi -> (n (I, B), read_prob (1, B)).

        read_prob cancels in the MH ratio (it depends only on the
        assignment, not psi) and is consumed only by the RECORDED
        log-likelihood -- compute_rp=False reduces only the counts.
        Padded reads (total weight 0) have u == 0 == every cumsum, so
        they land in bin 0 / -1 in the last bin: undone by the STATIC
        pad count instead of an (R, B) pass."""
        cums = []
        acc = None
        for i in range(I):
            rw_i = read_w_i(i) * psi[i:i + 1]
            acc = rw_i if acc is None else acc + rw_i
            cums.append(acc)
        u = _u01_reads(R, B) * acc
        n_rows = []
        read_prob = jnp.zeros((1, B), jnp.float32)
        if compute_rp:
            prev_ge = None
            for i in range(I):
                ge = (jnp.where(cums[i] >= u, 1.0, 0.0) if i < I - 1
                      else valid_f)
                oh = ge if prev_ge is None else ge - prev_ge
                n_rows.append(jnp.sum(oh, axis=0, keepdims=True))
                read_prob = read_prob + jnp.sum(oh * read_ls[i], axis=0,
                                                keepdims=True)
                prev_ge = ge
        else:
            prev_cnt = None
            for i in range(I):
                # padded reads count into every cums >= u (0 >= 0), so
                # they telescope out of every bin except bin 0 (hence
                # the bin0 -= n_pad below); the last bin ends at the
                # TRUE total n_valid, so its telescoped difference is
                # short by the pad count the previous cumsum included
                # (hence last += n_pad) -- using n_valid + n_pad here
                # inflated the last isoform's final_n by the pad count
                cnt = (jnp.sum(jnp.where(cums[i] >= u, 1.0, 0.0),
                               axis=0, keepdims=True) if i < I - 1
                       else n_valid)
                n_rows.append(cnt if prev_cnt is None else cnt - prev_cnt)
                prev_cnt = cnt
        # no adjustment for I == 1: both branches produce n_valid
        # directly (the single bin has no pad-polluted predecessor)
        if len(n_rows) > 1:
            n_rows[0] = n_rows[0] - n_pad
            n_rows[-1] = n_rows[-1] + n_pad
        return jnp.concatenate(n_rows, axis=0), read_prob

    # ---- init (miso.c:348-371 AUTO start + :834 propose + :840 gibbs);
    # with has_start, the GIVEN start (miso.c:405-409): alpha =
    # logit-ratio of the provided psi, matching mcmc.py _init_state
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
    alpha = alpha0 + noise_scale * _normal_rows(I, B) * amask
    psi, ld, logS = stats(alpha)
    n, rp = gibbs(psi)
    acc_count = jnp.zeros((1, B), jnp.float32)

    def step(m, alpha, psi, ld, logS, n, rp, acc_count,
             compute_rp=True, want_score=False):
        """One MH+Gibbs iteration (the hot loop miso.c:845-900).

        The MH log-ratio is assembled in alpha space: the proposal
        quadratic (miso.c:97-122) is symmetric in (alpha, alpha_new) and
        cancels, the read-score term is assignment-only and cancels, and
        the remaining pieces are linear in d = alpha_new - alpha."""
        full = (m > 0).astype(jnp.float32)
        d = noise_scale * _normal_rows(I, B) * amask
        alpha_new = alpha + d
        psi_new, ld_new, logS_new = stats(alpha_new)

        logr = (jnp.sum((n + h1) * d, axis=0, keepdims=True)
                - n_valid * (logS_new - logS)
                - H1 * (ld_new - ld)
                + full * (jnp.sum(d, axis=0, keepdims=True)
                          + kk * (ld - ld_new)))

        u = jnp.maximum(_u01((1, B)), 2.0 ** -24)
        accept = jnp.where(
            jnp.logical_or(logr >= 0, jnp.log(u) < logr), 1.0, 0.0)
        na = 1.0 - accept
        psi = accept * psi_new + na * psi
        alpha = accept * alpha_new + na * alpha
        ld = accept * ld_new + na * ld
        logS = accept * logS_new + na * logS
        acc_count = acc_count + accept
        score = (joint_abs(alpha, ld, logS, n, rp, n_valid)
                 if want_score else None)
        n, rp = gibbs(psi, compute_rp=compute_rp)
        return alpha, psi, ld, logS, n, rp, acc_count, score

    def plain_body(m, carry):
        alpha, psi, ld, logS, n, rp, acc_count = carry
        alpha, psi, ld, logS, n, rp, acc_count, _ = step(
            m, alpha, psi, ld, logS, n, rp, acc_count, compute_rp=False)
        return alpha, psi, ld, logS, n, rp, acc_count

    # Static record schedule (matches mcmc.py): burn_in steps, then a
    # record after every `lag` steps; phase aligns blocks.  Only the step
    # FEEDING a recorded score reduces the read-score term (for lag == 1
    # that is every step).
    phase = cfg.burn_in % cfg.lag
    nblocks = (cfg.iters - phase) // cfg.lag
    rec_offset = (cfg.burn_in - phase) // cfg.lag
    RREC = cfg.num_records
    tail_start = phase + nblocks * cfg.lag

    state = (alpha, psi, ld, logS, n, rp, acc_count)
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
            st, stage_psi, stage_ll = carry[:7], carry[7], carry[8]
            m0 = pre + (chunk * 128 + blk) * cfg.lag

            def inner(j, s):
                return step(m0 + j, *s, compute_rp=(cfg.lag == 1))[:7]

            # lag-2 cheap steps, one rp step feeding the recorded score,
            # then the record step itself
            if cfg.lag >= 2:
                st = jax.lax.fori_loop(0, cfg.lag - 2, inner, st)
                st = step(m0 + cfg.lag - 2, *st, compute_rp=True)[:7]
            out = step(m0 + cfg.lag - 1, *st,
                       compute_rp=(cfg.lag == 1), want_score=True)
            st, cjs_after = out[:7], out[7]

            mask = sub == blk
            if _DEBUG_NO_RECORD:
                mask = sub < 0
            psi_cur = st[1]
            stage_psi = [jnp.where(mask, psi_cur[i:i + 1], stage_psi[i])
                         for i in range(I)]
            stage_ll = jnp.where(mask, cjs_after, stage_ll)
            return st + (stage_psi, stage_ll)

        carry = jax.lax.fori_loop(0, n_in_chunk, chunk_body,
                                  state + (stage_psi, stage_ll))
        state, stage_psi, stage_ll = carry[:7], carry[7], carry[8]
        lo, hi = chunk * 128, (chunk + 1) * 128
        for i in range(I):
            psi_out_ref[0, i, lo:hi, :] = stage_psi[i]
        loglik_out_ref[0, lo:hi, :] = stage_ll

    if tail_start < cfg.iters:
        state = jax.lax.fori_loop(tail_start, cfg.iters, plain_body, state)

    alpha, psi, ld, logS, n, rp, acc_count = state
    acc_out_ref[0] = acc_count
    finaln_out_ref[0] = n
    finalpsi_out_ref[0] = psi


def _block_events(E: int, R: int, K: int, I: int, RPAD: int) -> int:
    """Events per grid block: read tiles + Gibbs temporaries + record
    blocks + staging must stay well under VMEM.  Prefer BE with
    B = K*BE a multiple of 128 (dense lane tiles)."""
    budget = int(_os.environ.get("MISO_PALLAS_VMEM_BUDGET",
                                 24 * 1024 * 1024))
    per_event = K * 4 * (
        I * R * 6                 # read tiles (x2) + Gibbs temporaries
        + (I + 1) * (RPAD + 256)  # record blocks + staging
        + 16 * I
    )
    be = max(1, min(budget // max(per_event, 1), E, 256))
    # legal blocks: lane width K*BE a multiple of 128, or the whole
    # array (Mosaic requires one or the other; a 192-lane fallback
    # block fails to lower).  Prefer the largest legal block within
    # the VMEM budget; when none fits (very long record buffers from
    # adaptive continuation schedules), take the SMALLEST legal block
    # -- over the soft budget but under the compiler's vmem limit.
    legal = [c for c in range(1, E + 1)
             if E % c == 0 and ((c * K) % 128 == 0 or c == E)]
    within = [c for c in legal if c <= be]
    return max(within) if within else min(legal)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def run_batch_pallas(key, events: EventBatch,
                     cfg: SamplerConfig,
                     interpret: bool = False,
                     start_psi=None) -> SamplerResult:
    """Drop-in alternative to mcmc.run_batch (REASSIGN + per-read Gibbs).

    Optional `start_psi` (E, K, I) selects the GIVEN chain start
    (miso.c:405-409) -- used by the convergent-mean continuation rounds
    and the NNLS linear start, which previously had to fall back to the
    ~5x-slower XLA scan.

    interpret=True runs the kernel in the Pallas interpreter (CPU) --
    the Mosaic interpreter's prng_random_bits returns zeros, so this is
    only meaningful together with MISO_PALLAS_NO_PRNG=1, which makes the
    whole chain deterministic; used by the hermetic control-flow
    regression test (tests/test_pallas_interpret.py)."""
    assert cfg.algorithm == "reassign"
    E, C, I = events.weights.shape
    R = events.read_w.shape[1]
    K = cfg.chains
    RREC = cfg.num_records
    RPAD = -(-RREC // 128) * 128
    BE = _block_events(E, R, K, I, RPAD)
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
    h = jnp.where(iso_mask > 0, events.hyper.astype(f32), 1.0)
    dir_const = (gammaln(jnp.sum(jnp.where(iso_mask > 0, h, 0.0), axis=1))
                 - jnp.sum(jnp.where(iso_mask > 0, gammaln(h), 0.0), axis=1))
    scal = jnp.stack([noise_scale, dir_const], axis=1)

    def to_lanes(x):
        """(E, ...) -> (..., E*K): lane index = event*K + chain."""
        x = jnp.repeat(x, K, axis=0)
        return jnp.moveaxis(x, 0, -1)

    # (E, R, I) -> (I, R, E*K) weight tiles, upcast to f32 HERE (storage
    # and host transfer stay bf16).  Measured dead ends on the tile
    # layout (the kernel is VPU-throughput-bound, NOT VMEM-load-bound):
    # bf16-dtype tiles 13.5k events/s (per-iteration convert pass),
    # bf16-pair-packed int32 tiles + in-kernel mask/shift unpack 13.4k,
    # f32 tiles 14.5k.  Doubling the block (B=1536) is throughput-
    # neutral, confirming saturation rather than latency binding.
    read_w = to_lanes(jnp.swapaxes(events.read_w.astype(f32), 1, 2))
    read_ls = to_lanes(jnp.swapaxes(events.read_logscore.astype(f32), 1, 2))
    log_iso_w_t = to_lanes(events.log_iso_w.astype(f32))
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
    inputs = [seed, read_w, read_ls, log_iso_w_t, hyper_t,
              amask_t, iso_mask_t, last_onehot_t, scal_t]
    in_specs = [
        in_bspec((I, R)), in_bspec((I, R)), in_bspec((I,)),
        in_bspec((I,)), in_bspec((I,)), in_bspec((I,)), in_bspec((I,)),
        in_bspec((2,)),
    ]
    if has_start:
        # (E, K, I) -> (I, E*K): per-(event, chain) lane layout
        sp = jnp.asarray(start_psi, f32).reshape(E * K, I)
        inputs.append(jnp.moveaxis(sp, 0, -1))
        in_specs.append(in_bspec((I,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=[
            out_bspec((I, RPAD)), out_bspec((RPAD,)),
            out_bspec((1,)), out_bspec((I,)), out_bspec((I,)),
        ],
    )
    kernel = functools.partial(_sampler_kernel, cfg=cfg, B=B, I=I, R=R,
                               has_start=has_start)
    psi_s, loglik, acc, final_n, final_psi = pl.pallas_call(
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
    acc_ek = acc[:, 0, :].reshape(E, K)
    accepted = jnp.sum(acc_ek, axis=1).astype(jnp.int32)
    final_n_out = jnp.transpose(
        final_n.reshape(NB, I, BE, K), (0, 2, 3, 1)).reshape(E, K, I)
    final_psi_out = jnp.transpose(
        final_psi.reshape(NB, I, BE, K), (0, 2, 3, 1)).reshape(E, K, I)
    total = cfg.iters * K
    return SamplerResult(
        psi_samples=psi_samples, loglik=loglik_out,
        accepted=accepted, rejected=total - accepted,
        final_n=final_n_out, final_psi=final_psi_out,
    )
