"""Genome annotation with a TE library (RepeatMasker replacement).

Re-implements `module/pan_annotate_genome.py` / `annotate_genome.py`:
align every library consensus against the genome (the same seed->chain
kernels in library-vs-genome mode), merge hits per locus, and emit
GFF / .out / .tbl plus the full-length-copy GFF (hits covering >= 95% of
their consensus, `Util.py:13679-13753`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.io.gff import AnnotationHit, write_full_length_gff, write_gff, \
    write_rm_out, write_tbl
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.utils.log import logger, stage_timer


def annotate_genome(
    genome: Genome,
    library: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
    min_hit_fraction: float = 0.3,
    mesh=None,
) -> List[AnnotationHit]:
    """Map library entries onto the genome; returns per-locus hits.

    With `mesh`, the library batch axis is sharded over the device mesh —
    the TPU equivalent of the reference's chunked parallel annotation
    (`parallel_annotate.nf:9-86`), with identical results.
    """
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex, max_chains=256, mesh=mesh)
    names = list(library.keys())
    seqs = [library[n] for n in names]

    with stage_timer("annotate.map"):
        copy_sets = finder.find_copies(
            seqs, min_coverage=min_hit_fraction,
            max_copies=10_000 // max(len(names), 1) + 200,
            max_len_ratio=1.5)

    hits: List[AnnotationHit] = []
    k = cfg.align.kmer_size
    for name, seq, copies in zip(names, seqs, copy_sets):
        family, _, te_class = name.partition("#")
        te_class = te_class or "Unknown"
        L = len(seq)
        for h in copies:
            ci, local = genome.contig_of(np.array([h.start]))
            ci = int(ci[0])
            span = h.end - h.start
            # seed-density identity proxy: matched k-mers / sampled positions
            ident = min(1.0, (h.nseeds / max(span - k + 1, 1)) ** (1.0 / k) + 0.05)
            hits.append(AnnotationHit(
                contig=genome.names[ci],
                start=int(local[0]) + 1,
                end=int(local[0]) + span,
                strand="+" if h.strand == 0 else "-",
                family=family,
                te_class=te_class,
                identity=float(ident),
                full_length=span >= cfg.library.full_length_cov * L,
            ))
    # resolve overlapping hits: keep the longer hit per overlapped locus
    hits.sort(key=lambda h: (h.contig, h.start))
    resolved: List[AnnotationHit] = []
    for h in hits:
        if resolved and resolved[-1].contig == h.contig and \
                h.start <= resolved[-1].end - 10:
            if (h.end - h.start) > (resolved[-1].end - resolved[-1].start):
                resolved[-1] = h
            continue
        resolved.append(h)
    logger.info("annotate: %d hits (%d after overlap resolution)",
                len(hits), len(resolved))
    return resolved


def write_annotation(
    out_prefix: str,
    hits: List[AnnotationHit],
    genome: Genome,
) -> None:
    write_gff(out_prefix + ".gff", hits)
    write_rm_out(out_prefix + ".out", hits)
    write_tbl(out_prefix + ".tbl", hits, genome.size)
    write_full_length_gff(out_prefix + ".full_length.gff", hits)
