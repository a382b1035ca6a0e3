"""Legacy event-format handling + count-based two-isoform events."""
import numpy as np

import jax

from miso_tpu.core.as_events import (MISOEvents, TwoIsoEvent,
                                     parse_event_information,
                                     se_event_to_gene,
                                     tandem_utr_event_to_gene)
from miso_tpu.core.events import pad_events, two_iso_event_from_counts
from miso_tpu.sampler.mcmc import EventBatch, SamplerConfig, run_batch


def test_parse_se_event_name():
    name = "chr17:100:199:+;chr17:300:349:+;chr17:500:599:+"
    ev = parse_event_information(name, "SE")
    assert ev.chrom == "chr17"
    assert ev.up_part_len == 100
    assert ev.len == 50
    assert ev.dn_part_len == 100


def test_se_event_to_gene():
    g = se_event_to_gene(100, 50, 100, "chr1", label="ev")
    assert g.num_isoforms == 2
    assert g.iso_lengths.tolist() == [250, 200]
    assert [p.label for p in g.parts] == ["A", "B", "C"]


def test_tandem_utr_event_to_gene():
    g = tandem_utr_event_to_gene(200, 100, "chr2")
    assert g.iso_lengths.tolist() == [300, 200]


def test_filter_se_events():
    events = {}
    for i, (ni, ne, nb) in enumerate([(5, 5, 20), (0, 5, 30), (10, 0, 5)]):
        ev = TwoIsoEvent(label="e%d" % i, event_type="SE")
        ev.num_inc, ev.num_exc, ev.num_common = ni, ne, nb
        events[ev.label] = ev
    m = MISOEvents(2, "SE", events=events)
    m.filter_se_events(atleast_inc=1, atleast_exc=1, atleast_sum=20)
    assert sorted(m.events) == ["e0"]


def test_events_to_genes_and_sampler():
    """The reference's legacy two-isoform flow: NI/NE/NB counts -> gene
    -> sampler (miso_sampler.py:469 run_sampler_on_event)."""
    g = se_event_to_gene(100, 50, 100, "chr1", label="ev")
    ev = two_iso_event_from_counts(g, ni=500, ne=50, nb=40, read_len=36)
    batch = EventBatch(**{k: np.asarray(v)
                          for k, v in pad_events([ev]).items()})
    cfg = SamplerConfig(iters=800, burn_in=200, lag=5, chains=2)
    res = run_batch(jax.random.PRNGKey(0), batch, cfg)
    mean = float(np.asarray(res.flat_samples())[0][:, 0].mean())
    # heavy inclusion support -> high psi
    assert mean > 0.75, mean
