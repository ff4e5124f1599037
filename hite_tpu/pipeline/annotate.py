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


def rescore_hit_identities(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    max_width: int = 4096,
    batch: int = 64,
) -> np.ndarray:
    """Real alignment identities for (consensus, hit-region) pairs.

    Batched Smith-Waterman (the itrsearch/blastx kernel in nucleotide
    mode) — identity = matches/alen of the best local alignment, replacing
    the round-1 seed-density proxy that fed `.out` div and GFF Identity
    (VERDICT weak #5). Sequences longer than max_width are centre-sliced:
    TE divergence is locus-wide, so a 4 kb window estimates it well.
    """
    import jax.numpy as jnp

    from hite_tpu.ops.terminal import batched_local_align_auto
    from hite_tpu.pipeline.candidates import pad_seqs

    out = np.zeros(len(pairs), np.float64)
    if not pairs:
        return out

    def clip(s: np.ndarray) -> np.ndarray:
        if len(s) <= max_width:
            return s
        mid = len(s) // 2
        return s[mid - max_width // 2 : mid + max_width // 2]

    order = sorted(range(len(pairs)),
                   key=lambda i: max(len(pairs[i][0]), len(pairs[i][1])))
    for b0 in range(0, len(order), batch):
        sel = order[b0 : b0 + batch]
        a_seqs = [clip(pairs[i][0]) for i in sel]
        b_seqs = [clip(pairs[i][1]) for i in sel]
        width = max(max(len(s) for s in a_seqs),
                    max(len(s) for s in b_seqs), 64)
        width = 1 << (width - 1).bit_length()
        B = 1 << (len(sel) - 1).bit_length()
        a_mat, _ = pad_seqs(a_seqs, width, n_rows=B)
        b_mat, _ = pad_seqs(b_seqs, width, n_rows=B)
        al = batched_local_align_auto(jnp.asarray(a_mat), jnp.asarray(b_mat))
        matches = np.asarray(al.matches)
        alen = np.asarray(al.alen)
        for bi, i in enumerate(sel):
            out[i] = matches[bi] / max(int(alen[bi]), 1)
    return out


def annotate_genome(
    genome: Genome,
    library: Dict[str, np.ndarray],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
    min_hit_fraction: float = 0.3,
    mesh=None,
    rescore: bool = True,
) -> List[AnnotationHit]:
    """Map library entries onto the genome; returns per-locus hits.

    With `mesh`, the library batch axis is sharded over the device mesh —
    the TPU equivalent of the reference's chunked parallel annotation
    (`parallel_annotate.nf:9-86`), with identical results.

    `rescore=False` skips the SW identity pass for interval-only consumers
    (the BM_HiTE/BM_EDTA base-level evaluators).
    """
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex, max_chains=256, mesh=mesh)
    names = list(library.keys())
    seqs = [library[n] for n in names]

    with stage_timer("annotate.map"):
        # min_abs_len: RepeatMasker hit semantics — keep LOCAL fragment
        # hits >= min_te_len bp even below min_hit_fraction of the entry,
        # so single-unit copies annotate against tandem-dimer / nested
        # composite entries and truncated copies against their family
        copy_sets = finder.find_copies(
            seqs, min_coverage=min_hit_fraction,
            max_copies=10_000 // max(len(names), 1) + 200,
            max_len_ratio=1.5,
            min_abs_len=max(80, cfg.library.min_te_len))

    hits: List[AnnotationHit] = []
    rescore_pairs: List[Tuple[np.ndarray, np.ndarray]] = []
    k = cfg.align.kmer_size
    for name, seq, copies in zip(names, seqs, copy_sets):
        family, _, te_class = name.partition("#")
        te_class = te_class or "Unknown"
        L = len(seq)
        for h in copies:
            ci, local = genome.contig_of(np.array([h.start]))
            ci = int(ci[0])
            span = h.end - h.start
            # seed-density identity proxy (refined by the SW pass below)
            ident = min(1.0, (h.nseeds / max(span - k + 1, 1)) ** (1.0 / k) + 0.05)
            if rescore:
                region = genome.extract(h.start, h.end)
                if h.strand == 1:
                    from hite_tpu.io.fasta import revcomp as np_revcomp

                    region = np_revcomp(region)
                rescore_pairs.append((seq, region))
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
    if rescore and hits:
        with stage_timer("annotate.rescore"):
            idents = rescore_hit_identities(rescore_pairs)
        for h, ident in zip(hits, idents):
            if ident > 0:
                h.identity = float(ident)
    resolved = resolve_overlaps(hits)
    logger.info("annotate: %d hits (%d after overlap resolution)",
                len(hits), len(resolved))
    return resolved


def resolve_overlaps(hits: List[AnnotationHit]) -> List[AnnotationHit]:
    """Resolve overlapping hits by ALIGNMENT SCORE, like RepeatMasker's
    locus resolution (pan_annotate_genome.py:27): score = span scaled by
    the SW-rescored identity under the engine's +1/-2 scoring — a clean
    short hit beats a longer but diverged one at nested loci (the
    previous longest-wins rule systematically favored the diverged hit)."""

    def _score(h: AnnotationHit) -> float:
        return (h.end - h.start + 1) * (3.0 * h.identity - 2.0)

    hits = sorted(hits, key=lambda h: (h.contig, h.start))
    resolved: List[AnnotationHit] = []
    for h in hits:
        if resolved and resolved[-1].contig == h.contig and \
                h.start <= resolved[-1].end - 10:
            if _score(h) > _score(resolved[-1]):
                resolved[-1] = h
            continue
        resolved.append(h)
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
