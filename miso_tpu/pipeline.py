"""End-to-end quantification pipeline: indexed GFF + alignments -> .miso.

The TPU-native replacement for the reference's process fan-out
(misopy/miso.py:70-337 GenesDispatcher + run_miso.py:34-202
compute_gene_psi): instead of forking a worker per gene batch, the host
compiles every runnable event into dense tensors (one streaming columnar
scan per chromosome, prefetched one chromosome ahead), buckets them by
padded shape, and runs each bucket as ONE device program over
(events x chains); results stream back quantized to the output precision
and the per-event `.miso` files (reference directory layout) are written
on a pool while later buckets are still transferring.

Per-event skip rules replicated:
- no reads fetched (miso_sampler.py:229-231)
- fewer than min_event_reads (run_miso.py:141-146)
- single-isoform genes (miso_sampler.py:272-276)
- existing .miso output => resume/idempotency (miso_sampler.py:234-238)
- all reads incompatible with the annotation (miso_sampler.py:352-354)
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from miso_tpu.core.events import (CompiledEvent, bucket_events,
                                  compile_paired_end, compile_single_end,
                                  pad_events)
from miso_tpu.core.gene import Gene
from miso_tpu.io import sam as sam_io
from miso_tpu.io.index import get_gene_ids_to_filenames, load_indexed_gene
from miso_tpu.io.miso_file import write_miso_file
from miso_tpu.io.settings import Settings
from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch


@dataclasses.dataclass
class RunConfig:
    read_len: int
    overhang_len: int = 1
    paired_end: bool = False
    mean_frag_len: Optional[float] = None
    frag_variance: Optional[float] = None
    num_sds: float = 4.0
    iters: int = 5000
    burn_in: int = 500
    lag: int = 10
    chains: int = 6
    algorithm: str = "reassign"
    min_event_reads: int = 20
    strand_rule: Optional[str] = None
    max_batch_events: int = 4096
    filter_read_len: Optional[int] = None  # drop reads of other lengths
    # 'auto' -> fused XLA scan (fastest measured); 'pallas' selects the
    # fused Pallas kernel; 'xla' forces the scan
    backend: str = "auto"
    # chain start: 'auto' (miso.c:348 AUTO) or 'linear' (MISO_START_LINEAR,
    # miso.c:410-443: NNLS deconvolution seeds every chain)
    start: str = "auto"
    # stop rule: 'fixed' (MISO_STOP_FIXEDNO, the reference CLI default,
    # miso_sampler.py:211) or 'convergent' (R-hat <= 1.1 with the
    # 3*noIter - 2*burnIn adaptive extension, miso.c:903-928)
    stop: str = "fixed"
    max_iters: int = 500000

    @classmethod
    def from_settings(cls, settings: Settings, read_len: int, **kw):
        sp = settings.get_sampler_params()
        return cls(
            read_len=read_len,
            iters=kw.pop("iters", sp["num_iters"]),
            burn_in=kw.pop("burn_in", sp["burn_in"]),
            lag=kw.pop("lag", sp["lag"]),
            chains=kw.pop("chains", sp["num_chains"]),
            min_event_reads=kw.pop("min_event_reads",
                                   settings.get_min_event_reads()),
            strand_rule=kw.pop("strand_rule", settings.get_strand_param()),
            stop=kw.pop("stop", settings.get_stop_rule()),
            max_iters=kw.pop("max_iters", settings.get_max_iters()),
            **kw)


def chrom_output_dir(output_dir: str, chrom: Optional[str]) -> str:
    return os.path.join(output_dir, chrom if chrom else "NA")


def event_output_path(output_dir: str, gene: Gene, name: str) -> str:
    return os.path.join(chrom_output_dir(output_dir, gene.chrom),
                        "%s.miso" % name)


def compile_gene_event(
    gene: Gene,
    name: str,
    reads: Tuple[Sequence[int], Sequence[str]],
    cfg: RunConfig,
) -> Optional[CompiledEvent]:
    """Compile one gene's reads into an event; None if skipped."""
    positions, cigars = reads
    if gene.num_isoforms < 2:
        return None
    num_units = len(positions) // 2 if cfg.paired_end else len(positions)
    if num_units == 0 or num_units < cfg.min_event_reads:
        return None
    # +1: 0-based alignment positions -> 1-based matcher coordinates
    # (miso_sampler.py:284)
    pos1 = np.asarray(positions, dtype=np.int64) + 1
    # PackedCigars pass through untouched (the native matcher consumes
    # the packed buffer zero-copy); only plain sequences are listified
    cig = cigars if hasattr(cigars, "buf") else list(cigars)
    if cfg.paired_end:
        ev = compile_paired_end(
            gene, pos1, cig, read_len=cfg.read_len,
            mean_frag_len=cfg.mean_frag_len, frag_variance=cfg.frag_variance,
            num_sds=cfg.num_sds, overhang=cfg.overhang_len, name=name)
    else:
        ev = compile_single_end(
            gene, pos1, cig, read_len=cfg.read_len,
            overhang=cfg.overhang_len, name=name, algorithm=cfg.algorithm)
    if not ev.any_compatible:
        return None
    return ev


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache (first compiles of a batch shape can
    take minutes on remote TPU runtimes; subsequent runs are instant)."""
    import jax

    cache_dir = os.environ.get(
        "MISO_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "miso_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def resolve_mesh(mesh="auto"):
    """Resolve the event mesh for production runs.

    'auto' -> 1-D mesh over all LOCAL devices when there is more than one
    (each host quantifies its own gene shard; the event axis has no
    cross-chip traffic, so the mesh never spans hosts); None on a
    single-device host.  This replaces the reference's fork-per-batch
    fan-out (misopy/miso.py:166-169,263 num_processors subprocesses).
    """
    if mesh != "auto":
        return mesh
    import jax

    devices = jax.local_devices()
    if len(devices) <= 1:
        return None
    from miso_tpu.parallel.mesh import make_event_mesh
    return make_event_mesh(devices)


def run_events(
    events: List[CompiledEvent],
    cfg: RunConfig,
    seed: int = 0,
    mesh="auto",
    bucket_stats: Optional[list] = None,
    on_chunk=None,
):
    """Run compiled events through the device sampler, bucketed by shape.

    Events are sharded over all local devices (see `resolve_mesh`); pass
    mesh=None to force single-device execution, or an explicit
    jax.sharding.Mesh.

    `bucket_stats`, if given, collects one dict per device batch:
    {shape, events, seconds, events_per_s} -- the per-bucket device-time
    counters the reference lacks (its only timer is the per-event
    wall-clock print, miso_sampler.py:373).

    Non-convergent buckets are DISPATCHED first and materialized after:
    JAX's async dispatch then overlaps bucket N's device execution with
    bucket N-1's host readback (the quantized psi fetch that dominates
    on remote runtimes).  Chunk event axes are padded to a bounded shape
    set (powers of two up to max_batch_events, via _pow2_pad_events) so
    arbitrary catalog sizes never mint new compile shapes.

    `on_chunk(indices, results)`, if given, fires as soon as each
    chunk's results land in the output list -- the caller can start
    writing files while later chunks are still transferring.

    Returns a list parallel to `events` of per-event result dicts.
    """
    import jax
    import jax.numpy as jnp

    from miso_tpu.sampler.mcmc import _pow2_pad_events

    enable_compilation_cache()
    mesh = resolve_mesh(mesh)

    sampler_cfg_base = SamplerConfig(
        iters=cfg.iters, burn_in=cfg.burn_in, lag=cfg.lag,
        chains=cfg.chains, algorithm=cfg.algorithm)
    out: List[Optional[dict]] = [None] * len(events)
    pending: List[dict] = []

    def _materialize_chunk(p: dict) -> None:
        chunk = p["chunk"]
        q = np.asarray(p["quant"])
        if p["two_iso"]:
            c0 = q.astype(np.float64) / 1e4
            flat = np.stack([c0, 1.0 - c0], axis=-1)
        else:
            flat = q.astype(np.float32) / 1e4
        cmin = np.asarray(p["ll_min"]).astype(np.float64)
        cmax = np.asarray(p["ll_max"]).astype(np.float64)
        loglik = (np.asarray(p["ll_resid"]).astype(np.float64)
                  + cmin[:, None]) / 100.0
        # padded events carry NaN score rows (masked lanes); only the
        # real rows matter, and only they may need the f32 fallback
        n_real = len(chunk)
        with np.errstate(invalid="ignore"):
            wide = np.flatnonzero(
                (cmax[:n_real] - cmin[:n_real]) > 65535)
        for i in wide:  # fetch just those rows at full precision
            loglik[i] = np.asarray(p["ll_full"][int(i)])
        accepted = np.asarray(p["accepted"])
        rejected = np.asarray(p["rejected"])
        final_n = np.asarray(p["final_n"])
        final_psi = np.asarray(p["final_psi"])
        for j, i in enumerate(chunk):
            k = events[i].num_iso
            fn = final_n[j, 0, :k]  # chain 0
            if cfg.algorithm != "reassign":
                # final assignment pass for non-REASSIGN algorithms
                # (miso.c:935-947)
                fn = events[i].final_assignment_counts(
                    final_psi[j, 0, :k])
            out[i] = {
                "samples": flat[j, :, :k],
                "loglik": loglik[j],
                "percent_accept": 100.0 * accepted[j]
                    / max(accepted[j] + rejected[j], 1),
                "final_n": fn,
            }
        if bucket_stats is not None:
            dt = time.time() - p["t0"]
            bucket_stats.append({
                "shape": p["shape"],
                "events": len(chunk), "seconds": dt,
                "events_per_s": len(chunk) / max(dt, 1e-9),
                "backend": p["backend"]})
        if on_chunk is not None:
            on_chunk(chunk, out)

    for (pad_iso, pad_classes, pad_reads), idxs in bucket_events(events):
        # very deep events: per-class multinomial Gibbs keeps device
        # memory and per-iteration work O(classes) instead of O(reads)
        # -- the per-read tensors are never materialized
        # (docs/DEEP_EVENTS.md)
        deep = pad_reads > 16384 and cfg.algorithm == "reassign"
        for lo in range(0, len(idxs), cfg.max_batch_events):
            t_bucket = time.time()
            chunk = idxs[lo:lo + cfg.max_batch_events]
            evs = [events[i] for i in chunk]
            pad = pad_events(evs, pad_iso=pad_iso, pad_classes=pad_classes,
                             pad_reads=pad_reads, per_read=not deep)
            batch = EventBatch(**{k: np.asarray(v) for k, v in pad.items()})
            sampler_cfg = sampler_cfg_base
            if deep:
                sampler_cfg = dataclasses.replace(sampler_cfg_base,
                                                  gibbs="multinomial")
            # key mixing must include EVERY bucket-shape axis: buckets
            # differing only in pad_reads would otherwise replay
            # identical per-(event, chain) random streams, correlating
            # Monte-Carlo error across the catalog
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed),
                                   lo + pad_iso * 131071
                                   + pad_classes * 8191),
                pad_reads)
            start_psi = None
            if cfg.start == "linear":
                from miso_tpu.core.assignment import linear_start_psi
                I_pad = batch.weights.shape[2]
                sp = np.zeros((len(evs), cfg.chains, I_pad), np.float32)
                for j, ev in enumerate(evs):
                    try:
                        expr = linear_start_psi(ev, cfg.read_len,
                                                cfg.overhang_len)
                    except Exception:
                        expr = np.full(ev.num_iso, 1.0 / ev.num_iso)
                    sp[j, :, :ev.num_iso] = expr[None, :]
                start_psi = sp
            backend = cfg.backend
            if backend == "auto":
                # measured on v5e at E=2048: fused Pallas kernels beat the
                # XLA scan on every algorithm (docs/VALIDATION.md)
                backend = ("pallas" if jax.default_backend() == "tpu"
                           and (cfg.algorithm in ("marginal", "classes")
                                or sampler_cfg.gibbs == "perread")
                           else "xla")
            if cfg.stop == "convergent":
                # R-hat <= 1.1 adaptive stopping (miso.c:903-928): only
                # unconverged events re-run, with extended schedules.
                # GIVEN-start kernel support keeps continuation rounds on
                # the fused Pallas path.
                from miso_tpu.sampler.mcmc import run_batch_convergent
                conv_res, _ = run_batch_convergent(
                    key, batch, sampler_cfg, max_iters=cfg.max_iters,
                    mesh=mesh, start_psi=start_psi, backend=backend)
                for j, i in enumerate(chunk):
                    r = conv_res[j]
                    k = events[i].num_iso
                    fn = r["final_n"][0, :k]
                    if cfg.algorithm != "reassign":
                        # final assignment pass from the END-OF-CHAIN
                        # psi (chain 0), as in the fixed-stop path
                        # (miso.c:935-947)
                        fn = events[i].final_assignment_counts(
                            r["final_psi"][0, :k])
                    out[i] = {
                        "samples": r["samples"][:, :k],
                        "loglik": r["loglik"],
                        "percent_accept": 100.0 * r["accepted"]
                            / max(r["accepted"] + r["rejected"], 1),
                        "final_n": fn,
                        "iters": int(r["iters"]),
                        "burn_in": int(r["burn_in"]),
                    }
                if bucket_stats is not None:
                    dt = time.time() - t_bucket
                    bucket_stats.append({
                        "shape": (pad_iso, pad_classes, pad_reads),
                        "events": len(chunk), "seconds": dt,
                        "events_per_s": len(chunk) / max(dt, 1e-9),
                        "stop": "convergent"})
                if on_chunk is not None:
                    on_chunk(chunk, out)
                continue
            # bounded compile shapes: pad the event axis to a power of
            # two (full chunks of max_batch_events stay untouched when
            # it is one) -- arbitrary catalog sizes reuse cached shapes
            batch, start_psi = _pow2_pad_events(batch, start_psi,
                                                len(chunk))
            sp_j = (None if start_psi is None
                    else jax.numpy.asarray(start_psi))
            if mesh is not None:
                from miso_tpu.parallel.mesh import run_batch_sharded
                res = run_batch_sharded(key, batch, sampler_cfg, mesh=mesh,
                                        backend=backend,
                                        start_psi=start_psi)
            elif (backend == "pallas"
                  and cfg.algorithm in ("marginal", "classes")):
                from miso_tpu.sampler.pallas_marginal import (
                    run_batch_pallas_marginal)
                res = run_batch_pallas_marginal(key, batch, sampler_cfg,
                                                start_psi=sp_j)
            elif (backend == "pallas" and cfg.algorithm == "reassign"
                  and sampler_cfg.gibbs == "perread"):
                from miso_tpu.sampler.pallas_kernel import run_batch_pallas
                res = run_batch_pallas(key, batch, sampler_cfg,
                                       start_psi=sp_j)
            else:
                res = run_batch(key, batch, sampler_cfg,
                                start_psi=sp_j)
            # fetch psi quantized to 1e-4 on device: exactly the .miso
            # output precision ("%.4f"), at a quarter of the bytes --
            # device->host transfer dominates on remote runtimes.
            # 2-isoform buckets (the dominant class) fetch ONLY column
            # 0; psi_2 = 1 - psi_1 reconstructs on the host.  Recorded
            # log-scores travel as per-event-offset uint16 centipoints
            # (the ".2f" output precision); rare events whose score
            # range exceeds the uint16 span fall back to their f32
            # rows.  Transfers are NOT forced here: pending chunks
            # materialize after every chunk has been dispatched, so
            # bucket N's readback overlaps bucket N+1's execution.
            flat_psi = res.flat_samples()
            if pad_iso == 2:
                quant = jnp.round(flat_psi[:, :, 0] * 1e4
                                  ).astype(jnp.uint16)
            else:
                quant = jnp.round(flat_psi * 1e4).astype(jnp.uint16)
            ll = res.flat_loglik()
            cents = jnp.round(ll * 100.0)
            cmin = jnp.min(cents, axis=1)
            cmax = jnp.max(cents, axis=1)
            resid = jnp.clip(cents - cmin[:, None], 0, 65535
                             ).astype(jnp.uint16)
            pending.append({
                "chunk": chunk, "quant": quant, "two_iso": pad_iso == 2,
                "ll_min": cmin, "ll_max": cmax, "ll_resid": resid,
                "ll_full": ll, "accepted": res.accepted,
                "rejected": res.rejected, "final_n": res.final_n,
                "final_psi": res.final_psi, "backend": backend,
                "t0": t_bucket,
                "shape": (pad_iso, pad_classes, pad_reads)})
            # bound device-memory retention: each pending chunk pins its
            # full-precision loglik (the wide-row fallback source) plus
            # the quantized buffers in HBM; a few chunks of lookahead is
            # all the transfer/compute overlap needs
            while len(pending) > 4:
                _materialize_chunk(pending.pop(0))

    for p in pending:
        _materialize_chunk(p)
    return out


def _write_event(output_dir: str, cfg: RunConfig, ev: CompiledEvent,
                 res: dict) -> None:
    """The single shared per-event .miso writer (used by both the batch
    writer below and the streamed on_chunk path in
    compute_all_genes_psi -- one place to change the output contract)."""
    path = event_output_path(output_dir, ev.gene, ev.name)
    write_miso_file(
        path, ev, res["samples"], res["loglik"],
        # convergent stopping records the per-event final schedule
        iters=res.get("iters", cfg.iters),
        burn_in=res.get("burn_in", cfg.burn_in), lag=cfg.lag,
        percent_accept=res["percent_accept"], final_n=res["final_n"])


def write_event_results(
    events: List[CompiledEvent],
    results: List[Optional[dict]],
    output_dir: str,
    cfg: RunConfig,
    workers: int = 4,
) -> int:
    def write_one(pair):
        _write_event(output_dir, cfg, *pair)
        return 1

    todo = [(ev, res) for ev, res in zip(events, results)
            if res is not None]
    if workers > 1 and len(todo) > 64:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return sum(pool.map(write_one, todo))
    return sum(map(write_one, todo))


def compute_all_genes_psi(
    index_dir: str,
    alignments_path: str,
    read_len: int,
    output_dir: str,
    cfg: Optional[RunConfig] = None,
    settings: Optional[Settings] = None,
    gene_ids: Optional[List[str]] = None,
    seed: int = 0,
    verbose: bool = True,
    profile_dir: Optional[str] = None,
) -> int:
    """The `miso --run` engine.  Returns the number of events written.

    Ref: misopy/miso.py:340-425 + run_miso.py:34-202, collapsed into one
    process with device-side batch parallelism.

    `profile_dir` wraps device execution in a jax.profiler trace
    (view with TensorBoard / xprof) and logs per-bucket device time.
    """
    from miso_tpu.io.sanity import check_gff_and_bam, setup_logger

    settings = settings or Settings.get()
    cfg = cfg or RunConfig.from_settings(settings, read_len)
    setup_logger(output_dir)
    check_gff_and_bam(index_dir, alignments_path,
                      given_read_len=cfg.filter_read_len)

    t0 = time.time()
    id_to_fname = get_gene_ids_to_filenames(index_dir)
    if gene_ids is not None:
        id_to_fname = {g: id_to_fname[g] for g in gene_ids if g in id_to_fname}
    alignments = sam_io.open_alignments(alignments_path)

    # whole-chromosome columnar scans, LRU-bounded (items are sorted by
    # per-chromosome pickle path, so at most ~2 chromosomes are live).
    # A one-thread prefetcher scans chromosome k+1 (native decode +
    # zlib, both GIL-releasing) while chromosome k's genes compile.
    import collections
    import threading
    from concurrent.futures import ThreadPoolExecutor
    scan_cache: "collections.OrderedDict" = collections.OrderedDict()
    scan_lock = threading.Lock()
    scan_method = ("scan_chrom_columnar_paired" if cfg.paired_end
                   else "scan_chrom_columnar")
    # paired chromosome scans never depend on the target strand
    # (fr-firststrand only reorders mates), so one scan per chromosome
    # serves both strands; single-end stranded scans are per-strand
    strandless = (cfg.paired_end
                  or cfg.strand_rule in (None, "fr-unstranded"))
    # chromosome visit order: gene.chrom of the first gene in each
    # per-chromosome pickle dir (dir names may carry an added 'chr'
    # prefix, io/index.py:41, so they cannot key the prefetch)
    chrom_seq: List[str] = []
    _seen_dirs: set = set()
    for _gid, _fn in sorted(id_to_fname.items(), key=lambda kv: kv[1]):
        _d = os.path.dirname(_fn)
        if _d in _seen_dirs:
            continue
        _seen_dirs.add(_d)
        try:
            _g = load_indexed_gene(_fn)[_gid]["gene_object"]
            if _g.chrom and _g.chrom not in chrom_seq:
                chrom_seq.append(_g.chrom)
        except Exception:
            pass
    chrom_next = {c: chrom_seq[i + 1]
                  for i, c in enumerate(chrom_seq[:-1])}
    prefetcher = ThreadPoolExecutor(max_workers=1)
    scan_futures: Dict[object, object] = {}

    def _scan_raw(chrom, strand):
        try:
            return getattr(alignments, scan_method)(
                chrom, given_read_len=cfg.filter_read_len,
                strand_rule=cfg.strand_rule,
                target_strand=None if strandless else strand)
        except KeyError:
            return KeyError  # sentinel: chrom absent from the BAM

    def chrom_scan(chrom, strand):
        if not hasattr(alignments, scan_method):
            return None
        key = (chrom, None if strandless else strand)
        with scan_lock:
            if key in scan_cache:
                scan_cache.move_to_end(key)
                hit = scan_cache[key]
                if hit is KeyError:  # cached BAM-absent chromosome
                    raise KeyError(chrom)
                return hit
            fut = scan_futures.pop(key, None)
            if fut is None:
                fut = prefetcher.submit(_scan_raw, chrom, strand)
            # prefetch the NEXT chromosome while this one resolves /
            # compiles (strandless keys only: stranded keys are
            # per-gene, so the next gene's strand is unknown here)
            nxt = chrom_next.get(chrom)
            if (strandless and nxt is not None
                    and (nxt, None) not in scan_futures
                    and (nxt, None) not in scan_cache):
                scan_futures[(nxt, None)] = prefetcher.submit(
                    _scan_raw, nxt, None)
        scan = fut.result()
        with scan_lock:
            scan_cache[key] = scan
            while len(scan_cache) > 4:
                scan_cache.popitem(last=False)
        if scan is KeyError:
            raise KeyError(chrom)
        return scan

    def compile_one(item):
        gene_id, pickle_fname = item
        entry = load_indexed_gene(pickle_fname)[gene_id]
        gene: Gene = entry["gene_object"]
        # --compress-id indexes name outputs by the hashed ID
        # (index_gff.py:80-99; summarize/compare map back via
        # --use-compressed)
        out_name = entry.get("compressed_id") or gene_id
        out_path = event_output_path(output_dir, gene, out_name)
        if os.path.isfile(out_path):
            if verbose:
                print("Output filename %s exists, not running MISO."
                      % out_path)
            return None
        lo, hi = gene.genomic_span()
        if hasattr(alignments, "fetch_columnar"):
            # columnar ingest: native batch decode (and native qname
            # pairing for paired-end) straight to (positions, cigars),
            # no per-read Python objects.  Single-end unstranded genes
            # read from ONE whole-chromosome scan (region fetches become
            # array slices; see sam.ChromReads) -- at catalog scale the
            # repeated per-gene block decode dominated host compile.
            col = None
            try:
                scan = chrom_scan(gene.chrom, gene.strand)
                if scan is not None:
                    col = scan.slice(lo - 1, hi)
                elif cfg.paired_end:
                    col = alignments.fetch_columnar_paired(
                        gene.chrom, lo - 1, hi,
                        given_read_len=cfg.filter_read_len,
                        strand_rule=cfg.strand_rule,
                        target_strand=gene.strand)
                else:
                    col = alignments.fetch_columnar(
                        gene.chrom, lo - 1, hi,
                        given_read_len=cfg.filter_read_len,
                        strand_rule=cfg.strand_rule,
                        target_strand=gene.strand)
            except KeyError:
                pass  # chr-prefix fallback below
            if col is not None:
                return compile_gene_event(gene, out_name, col[:2], cfg)
        raw = sam_io.fetch_bam_reads_in_gene(
            alignments, gene.chrom, lo - 1, hi)
        reads, _ = sam_io.sam_parse_reads(
            raw, paired_end=cfg.paired_end, strand_rule=cfg.strand_rule,
            target_strand=gene.strand,
            given_read_len=cfg.filter_read_len)
        return compile_gene_event(gene, out_name, reads, cfg)

    # group by per-chromosome pickle directory so the whole-chromosome
    # scan cache stays small, then by gene id for determinism
    items = sorted(id_to_fname.items(), key=lambda kv: (kv[1], kv[0]))
    if items and getattr(alignments, "references", None):
        # build the region index once before fanning out threads
        list(alignments.fetch(alignments.references[0], 0, 0))
    # the native matcher releases the GIL inside ctypes calls, so event
    # compilation threads scale on real catalogs (the reference's
    # num_processors knob, settings.py:148, repurposed host-side).
    # With the whole-chromosome scan path the per-gene work is
    # GIL-bound numpy slicing -- threads only contend there (measured
    # 2x SLOWER at 10k genes), so single-end native catalogs compile
    # single-threaded.
    workers = max(1, (settings.get_num_processors() or 1))
    if hasattr(alignments, "scan_chrom_columnar"):
        from miso_tpu import native
        if native.load() is not None:
            workers = 1
    try:
        if workers > 1 and len(items) > 64:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                compiled = list(pool.map(compile_one, items))
        else:
            compiled = [compile_one(it) for it in items]
    finally:
        # cancel any unconsumed prefetch (e.g. every output of its
        # chromosome already existed) so a whole-chromosome scan does
        # not keep running beside device sampling
        prefetcher.shutdown(wait=False, cancel_futures=True)
    events: List[CompiledEvent] = [ev for ev in compiled if ev is not None]
    skipped = len(items) - len(events)
    t_compile = time.time() - t0

    mesh = resolve_mesh("auto")
    if verbose and mesh is not None:
        print("Event catalog sharded over %d local devices"
              % mesh.devices.size)
    import jax

    bucket_stats: List[dict] = []
    # stream writes: as each chunk's results land on the host, its
    # .miso files format+write on a small pool while later chunks are
    # still transferring from the device
    from concurrent.futures import ThreadPoolExecutor
    write_pool = ThreadPoolExecutor(max_workers=4)
    write_futures = []

    def on_chunk(idxs, out):
        for i in idxs:
            res = out[i]
            if res is None:
                continue
            write_futures.append(write_pool.submit(
                _write_event, output_dir, cfg, events[i], res))

    if profile_dir:
        os.makedirs(profile_dir, exist_ok=True)
        with jax.profiler.trace(profile_dir):
            run_events(events, cfg, seed=seed, mesh=mesh,
                       bucket_stats=bucket_stats, on_chunk=on_chunk)
        if verbose:
            print("jax.profiler trace written to %s" % profile_dir)
    else:
        run_events(events, cfg, seed=seed, mesh=mesh,
                   bucket_stats=bucket_stats, on_chunk=on_chunk)
    written = 0
    for f in write_futures:
        f.result()
        written += 1
    write_pool.shutdown()
    if verbose:
        dt = time.time() - t0
        n_dev = max(1, len(jax.local_devices()))
        for bs in bucket_stats:
            print("  bucket (iso=%d, classes=%d, reads=%d): %d events "
                  "in %.2fs (%.1f events/s)"
                  % (bs["shape"] + (bs["events"], bs["seconds"],
                                    bs["events_per_s"])))
        print("Quantified %d events (%d skipped) in %.2fs "
              "(host compile %.2fs); %.1f events/s (%.1f events/s/chip)"
              % (written, skipped, dt, t_compile,
                 written / max(dt, 1e-9),
                 written / max(dt, 1e-9) / n_dev))
    return written
