"""Legacy (pre-GFF) alternative-splicing event handling.

Parity targets: misopy/as_events.py (TwoIsoEvent, MISOEvents with
count-based filters, event-string parsers :303-414) and the event->gene
builders in misopy/Gene.py:1042-1131 (se_event_to_gene,
tandem_utr_event_to_gene, afe_ale_event_to_gene).

Event names encode coordinates, e.g. an SE event:
``chr17:123:456:+;chr17:789:900:+;chr17:1000:1200:+`` (up;se;dn parts).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from miso_tpu.core.gene import Exon, Gene, Isoform


@dataclass
class TwoIsoEvent:
    """A two-isoform event with its count summaries.
    Ref: misopy/as_events.py:27-86."""

    label: str
    event_type: str  # SE | RI | A3SS | A5SS | TandemUTR | AFE | ALE
    chrom: Optional[str] = None
    len: Optional[int] = None
    up_part_len: Optional[int] = None
    dn_part_len: Optional[int] = None
    # SE/RI counts
    num_inc: Optional[int] = None
    num_exc: Optional[int] = None
    num_common: Optional[int] = None
    # TandemUTR counts
    core_len: Optional[int] = None
    ext_len: Optional[int] = None
    num_core: Optional[int] = None
    num_ext: Optional[int] = None
    # AFE/ALE
    proximal_exons: List[dict] = field(default_factory=list)
    distal_exons: List[dict] = field(default_factory=list)
    num_proximal_body: Optional[int] = None
    num_distal_body: Optional[int] = None
    num_proximal_jxns: Optional[int] = None
    num_distal_jxns: Optional[int] = None


def parse_part(exon: str, delimiter: str = ":") -> Tuple[str, int, int, str]:
    """``chrom:start:end:strand`` -> tuple.
    Ref: as_events.py parse_part."""
    chrom, start, end, strand = exon.split(delimiter)
    return chrom, int(start), int(end), strand


def parse_event_information(event_name: str, event_type: str,
                            delimiter: str = ";") -> TwoIsoEvent:
    """Fill part lengths from a coordinate-encoded event name.
    Ref: as_events.py parse_event_information."""
    ev = TwoIsoEvent(label=event_name, event_type=event_type)
    if event_type in ("SE", "RI"):
        up, mid, dn = event_name.split(delimiter)
        chrom, s, e, _ = parse_part(up)
        ev.chrom = chrom
        ev.up_part_len = e - s + 1
        _, s, e, _ = parse_part(mid)
        ev.len = e - s + 1
        _, s, e, _ = parse_part(dn)
        ev.dn_part_len = e - s + 1
    elif event_type == "TandemUTR":
        core, ext = event_name.split(delimiter)
        chrom, s, e, _ = parse_part(core)
        ev.chrom = chrom
        ev.core_len = e - s + 1
        _, s, e, _ = parse_part(ext)
        ev.ext_len = e - s + 1
    else:
        raise ValueError("Unsupported event type: %s" % event_type)
    return ev


# ----------------------------------------------------- event -> gene

def se_event_to_gene(up_len: int, se_len: int, dn_len: int,
                     chrom: Optional[str], label: Optional[str] = None
                     ) -> Gene:
    """SE/RI event -> 3-part, 2-isoform gene (Gene.py:1042-1061)."""
    parts = [
        Exon(0, up_len - 1, label="A"),
        Exon(up_len, up_len + se_len - 1, label="B"),
        Exon(up_len + se_len, up_len + se_len + dn_len - 1, label="C"),
    ]
    isoforms = [Isoform((0, 1, 2), desc=["A", "B", "C"]),
                Isoform((0, 2), desc=["A", "C"])]
    return Gene(parts=parts, isoforms=isoforms, label=label, chrom=chrom)


def tandem_utr_event_to_gene(core_len: int, ext_len: int,
                             chrom: Optional[str],
                             label: Optional[str] = None) -> Gene:
    """TandemUTR event -> 2-part, 2-isoform gene (Gene.py:1063-1079)."""
    parts = [
        Exon(0, core_len - 1, label="TandemUTRCore"),
        Exon(core_len, core_len + ext_len - 1, label="TandemUTRExt"),
    ]
    isoforms = [
        Isoform((0, 1), desc=["TandemUTRCore", "TandemUTRExt"]),
        Isoform((0,), desc=["TandemUTRCore"]),
    ]
    return Gene(parts=parts, isoforms=isoforms, label=label, chrom=chrom)


def afe_ale_event_to_gene(proximal_exons: List[dict],
                          distal_exons: List[dict], event_type: str,
                          chrom: Optional[str],
                          read_len: Optional[int] = None,
                          overhang_len: Optional[int] = None,
                          label: Optional[str] = None) -> Gene:
    """AFE/ALE event -> 2 single-exon isoforms (Gene.py:1086-1127)."""
    njp = read_len if (read_len is not None and
                       overhang_len is not None) else 0
    distal_len = sum(e["len"] for e in distal_exons) + njp
    proximal_len = sum(e["len"] for e in proximal_exons) + njp
    distal = Exon(0, distal_len - 1, label="%sDistal" % event_type)
    proximal = Exon(distal_len, distal_len + proximal_len - 1,
                    label="%sProximal" % event_type)
    parts = [distal, proximal]
    isoforms = [Isoform((1,), desc=["%sProximal" % event_type]),
                Isoform((0,), desc=["%sDistal" % event_type])]
    return Gene(parts=parts, isoforms=isoforms, label=label, chrom=chrom)


class MISOEvents:
    """A set of two-isoform events with count-based filters.
    Ref: as_events.py:99-301."""

    def __init__(self, num_iso: int, event_type: str,
                 events: Optional[Dict[str, TwoIsoEvent]] = None):
        self.num_iso = num_iso
        self.event_type = event_type
        self.events: Dict[str, TwoIsoEvent] = events or {}

    def get_event(self, event_name: str) -> Optional[TwoIsoEvent]:
        return self.events.get(event_name)

    def __len__(self) -> int:
        return len(self.events)

    def filter_se_events(self, atleast_inc=1, atleast_exc=1,
                         atleast_sum=20) -> None:
        """Ref: as_events.py:194-210."""
        self.events = {
            name: ev for name, ev in self.events.items()
            if ((ev.num_inc or 0) >= atleast_inc and
                (ev.num_exc or 0) >= atleast_exc and
                ((ev.num_inc or 0) + (ev.num_exc or 0)
                 + (ev.num_common or 0)) >= atleast_sum)
        }

    filter_ri_events = filter_se_events  # same rule shape (as_events:176)

    def filter_tandem_utr_events(self, atleast_core=1, atleast_ext=1,
                                 atleast_sum=20) -> None:
        """Ref: as_events.py:158-174."""
        self.events = {
            name: ev for name, ev in self.events.items()
            if ((ev.num_core or 0) >= atleast_core and
                (ev.num_ext or 0) >= atleast_ext and
                ((ev.num_core or 0) + (ev.num_ext or 0)) >= atleast_sum)
        }

    def loaded_events_to_genes(self, read_len=None, overhang_len=None
                               ) -> Dict[str, Gene]:
        """Ref: as_events.py:233-269."""
        out: Dict[str, Gene] = {}
        for name, ev in self.events.items():
            if self.event_type in ("SE", "RI"):
                out[name] = se_event_to_gene(
                    ev.up_part_len, ev.len, ev.dn_part_len, ev.chrom,
                    label=ev.label)
            elif self.event_type == "TandemUTR":
                out[name] = tandem_utr_event_to_gene(
                    ev.core_len, ev.ext_len, ev.chrom, label=ev.label)
            elif self.event_type in ("AFE", "ALE"):
                out[name] = afe_ale_event_to_gene(
                    ev.proximal_exons, ev.distal_exons, self.event_type,
                    ev.chrom, read_len=read_len,
                    overhang_len=overhang_len, label=ev.label)
            else:
                raise ValueError(
                    "Unsupported event type: %s" % self.event_type)
        return out
